"""Sharded (data x table mesh) coarse mapper == single-device engine."""

import random

import numpy as np
import pytest

import jax

from hashreadmapper_tpu.config import ProgramOptions
from hashreadmapper_tpu.cpu import oracle
from hashreadmapper_tpu.io.genome import Genome
from hashreadmapper_tpu.parallel.sharded import ShardedCoarseMapper, make_mesh
from hashreadmapper_tpu.pipeline.engine import CoarseMapper


def _data(seed=11, n_reads=48, chrom_len=2000, maxlen=32):
    rng = random.Random(seed)
    chrom = "".join(rng.choice("ACGT") for _ in range(chrom_len))
    reads = []
    for _ in range(n_reads):
        rl = rng.randint(12, maxlen)
        if rng.random() < 0.75:
            s = rng.randrange(chrom_len - rl)
            b = oracle.encode_bases(chrom[s:s + rl])
            if rng.random() < 0.5:
                b = oracle.revcomp_bases(b)
        else:
            b = [rng.randrange(4) for _ in range(rl)]
        reads.append(b)
    bases = np.zeros((n_reads, maxlen), dtype=np.int8)
    lens = np.zeros(n_reads, dtype=np.int32)
    for i, b in enumerate(reads):
        bases[i, :len(b)] = b
        lens[i] = len(b)
    return chrom, bases, lens


@pytest.mark.parametrize("shape", [(4, 2), (8, 1), (2, 4), (1, 8)])
def test_sharded_matches_single_device(shape):
    if len(jax.devices()) < shape[0] * shape[1]:
        pytest.skip("needs 8 devices")
    chrom, bases, lens = _data()
    opts = ProgramOptions(
        kmer_length=8, num_hash_functions=8, window_size=32,
        min_table_hits=2, batchsize=8, max_hamming_percent=0.15,
        probe_cap=64, candidates_per_read_cap=32, max_read_length=32)
    genome = Genome(["c0"], [chrom])

    single = CoarseMapper(genome, opts)
    want = single.map_reads(bases.copy(), lens.copy())

    mesh = make_mesh(*shape)
    sharded = ShardedCoarseMapper(genome, opts, mesh)
    ori, ham, shift, chrom_id, pos, gwin, overflow = sharded.map_reads(
        bases.copy(), lens.copy())

    np.testing.assert_array_equal(ori, want.orientation)
    mapped = want.orientation != 3
    np.testing.assert_array_equal(ham[mapped], want.hamming[mapped])
    np.testing.assert_array_equal(shift[mapped], want.shift[mapped])
    np.testing.assert_array_equal(pos[mapped], want.position[mapped])
    np.testing.assert_array_equal(gwin[mapped],
                                  want.global_window_id[mapped])
