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
    got = sharded.map_reads(bases.copy(), lens.copy())

    np.testing.assert_array_equal(got.orientation, want.orientation)
    mapped = want.orientation != 3
    np.testing.assert_array_equal(got.hamming[mapped], want.hamming[mapped])
    np.testing.assert_array_equal(got.shift[mapped], want.shift[mapped])
    np.testing.assert_array_equal(got.position[mapped],
                                  want.position[mapped])
    np.testing.assert_array_equal(got.global_window_id[mapped],
                                  want.global_window_id[mapped])
    np.testing.assert_array_equal(got.bs_strand, want.bs_strand)
    for k in ("probe_overflow", "vote_overflow", "pair_budget_overflow",
              "probe_tail_overflow"):
        assert got.stats[k] == want.stats[k], k


def _bs_data(seed=17, n_reads=48, chrom_len=2000, maxlen=32, conv=0.9):
    """BS-converted reads (C->T at `conv` rate, 50% RC)."""
    rng = random.Random(seed)
    chrom = "".join(rng.choice("ACGT") for _ in range(chrom_len))
    reads = []
    for _ in range(n_reads):
        rl = rng.randint(12, maxlen)
        if rng.random() < 0.8:
            s = rng.randrange(chrom_len - rl)
            b = [(3 if (x == 1 and rng.random() < conv) else x)
                 for x in oracle.encode_bases(chrom[s:s + rl])]
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


@pytest.mark.parametrize("shape", [(4, 2), (2, 4), (1, 8)])
def test_sharded_three_n_matches_single_device(shape):
    """3N (bisulfite) config over the mesh == single-device 3N engine."""
    if len(jax.devices()) < shape[0] * shape[1]:
        pytest.skip("needs 8 devices")
    chrom, bases, lens = _bs_data()
    opts = ProgramOptions(
        kmer_length=8, num_hash_functions=8, window_size=32,
        min_table_hits=2, batchsize=8, max_hamming_percent=0.15,
        probe_cap=64, candidates_per_read_cap=32, max_read_length=32,
        three_n_seeding=True)
    genome = Genome(["c0"], [chrom])

    single = CoarseMapper(genome, opts)
    want = single.map_reads(bases.copy(), lens.copy())
    assert int((want.orientation != 3).sum()) > n_mapped_floor(len(lens))

    mesh = make_mesh(*shape)
    sharded = ShardedCoarseMapper(genome, opts, mesh)
    got = sharded.map_reads(bases.copy(), lens.copy())

    np.testing.assert_array_equal(got.orientation, want.orientation)
    mapped = want.orientation != 3
    np.testing.assert_array_equal(got.hamming[mapped], want.hamming[mapped])
    np.testing.assert_array_equal(got.shift[mapped], want.shift[mapped])
    np.testing.assert_array_equal(got.position[mapped],
                                  want.position[mapped])
    np.testing.assert_array_equal(got.global_window_id[mapped],
                                  want.global_window_id[mapped])


def n_mapped_floor(n):
    return n // 4   # most planted BS reads must map in 3N mode


def test_sharded_index_build_is_sharded():
    """Per-shard build: no device holds more than its table shard."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    chrom, bases, lens = _data(seed=5)
    opts = ProgramOptions(
        kmer_length=8, num_hash_functions=8, window_size=32,
        min_table_hits=2, batchsize=8, max_hamming_percent=0.15,
        probe_cap=64, candidates_per_read_cap=32, max_read_length=32)
    genome = Genome(["c0"], [chrom])
    mesh = make_mesh(2, 4)
    sharded = ShardedCoarseMapper(genome, opts, mesh)
    mem = sharded.index_memory_per_device()
    total = sum(mem.values())
    n_dev = len(mesh.devices.reshape(-1))
    for dev, b in mem.items():
        # each device holds ~1/n_table of the index (replicated along the
        # data axis), never the whole thing
        assert b <= total // mesh.shape["table"] + 1024, (dev, b, total)
    assert len(mem) == n_dev
    # and the sharded-build index must give the same results as the
    # single-device build (covered in depth above; quick spot check here)
    single = CoarseMapper(genome, opts)
    want = single.map_reads(bases.copy(), lens.copy())
    got = sharded.map_reads(bases.copy(), lens.copy())
    np.testing.assert_array_equal(got.orientation, want.orientation)


def test_sharded_budgets_match_single_device():
    """Budgeted (pair compaction + two-tier probe) sharded step == budgeted
    single-device engine == unbudgeted results (no overflow)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    chrom, bases, lens = _bs_data(seed=23)
    kw = dict(
        kmer_length=8, num_hash_functions=8, window_size=32,
        min_table_hits=2, batchsize=8, max_hamming_percent=0.15,
        probe_cap=8, candidates_per_read_cap=8, max_read_length=32,
        three_n_seeding=True)
    genome = Genome(["c0"], [chrom])
    want = CoarseMapper(genome, ProgramOptions(**kw)).map_reads(
        bases.copy(), lens.copy())

    opts_b = ProgramOptions(**kw, shd_pairs_per_read_budget=4,
                            probe_tail_budget_per_read=4)
    sharded = ShardedCoarseMapper(genome, opts_b, make_mesh(2, 4))
    got = sharded.map_reads(bases.copy(), lens.copy())
    np.testing.assert_array_equal(got.orientation, want.orientation)
    mapped = want.orientation != 3
    np.testing.assert_array_equal(got.hamming[mapped], want.hamming[mapped])
    np.testing.assert_array_equal(got.position[mapped],
                                  want.position[mapped])
    np.testing.assert_array_equal(got.global_window_id[mapped],
                                  want.global_window_id[mapped])
    assert got.stats["pair_budget_overflow"] == 0
    assert got.stats["probe_tail_overflow"] == 0
