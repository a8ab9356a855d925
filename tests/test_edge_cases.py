"""Edge cases: tiny chromosomes, odd parameters, degenerate inputs."""

import random

import numpy as np
import pytest

from hashreadmapper_tpu.config import ProgramOptions
from hashreadmapper_tpu.cpu import oracle, reference_pipeline
from hashreadmapper_tpu.io.genome import Genome
from hashreadmapper_tpu.pipeline.engine import CoarseMapper


def _map(chroms, reads, opts):
    genome = Genome([f"c{i}" for i in range(len(chroms))], chroms)
    mapper = CoarseMapper(genome, opts)
    n = max(1, len(reads))
    maxlen = opts.max_read_length
    bases = np.zeros((n, maxlen), dtype=np.int8)
    lens = np.zeros(n, dtype=np.int32)
    for i, r in enumerate(reads):
        e = oracle.encode_bases(r)
        bases[i, :len(e)] = e
        lens[i] = len(e)
    if not reads:
        bases = bases[:0]
        lens = lens[:0]
    return mapper.map_reads(bases, lens)


def test_chromosome_shorter_than_window():
    rng = random.Random(1)
    tiny = "".join(rng.choice("ACGT") for _ in range(20))   # < window, > k
    big = "".join(rng.choice("ACGT") for _ in range(400))
    opts = ProgramOptions(
        kmer_length=8, num_hash_functions=8, window_size=32,
        min_table_hits=2, batchsize=8, max_hamming_percent=0.1,
        probe_cap=32, candidates_per_read_cap=16, max_read_length=16)
    reads = [tiny[2:14], big[100:112]]
    res = _map([tiny, big], reads, opts)
    # ground truth from the reference-orientation oracle (a 12bp read can
    # legitimately miss the min-table-hits vote)
    want = reference_pipeline.coarse_map(
        [oracle.encode_bases(tiny), oracle.encode_bases(big)],
        [oracle.encode_bases(r) for r in reads], opts)
    for i, w in enumerate(want):
        assert res.orientation[i] == w.orientation
        if w.orientation != oracle.NONE:
            assert res.chromosome_id[i] == w.chromosome_id
            assert res.position[i] + res.shift[i] == w.position + w.shift
    assert want[0].orientation != oracle.NONE  # the tiny-chrom read maps
    assert res.position[0] + res.shift[0] == 2


def test_chromosome_shorter_than_k():
    opts = ProgramOptions(
        kmer_length=8, num_hash_functions=4, window_size=32,
        min_table_hits=1, batchsize=4, probe_cap=8,
        candidates_per_read_cap=8, max_read_length=16)
    # 5-base chromosome yields one window with no valid signature
    res = _map(["ACGTA", "ACGTACGTACGTACGTACGTACGT"],
               ["CGTACGTACGT"], opts)
    assert res.orientation[0] != 3
    assert res.chromosome_id[0] == 1


def test_empty_read_set():
    opts = ProgramOptions(
        kmer_length=8, num_hash_functions=4, window_size=32,
        min_table_hits=1, batchsize=4, probe_cap=8,
        candidates_per_read_cap=8, max_read_length=16)
    res = _map(["ACGT" * 30], [], opts)
    assert len(res.orientation) == 0


def test_single_read_single_window_genome():
    opts = ProgramOptions(
        kmer_length=8, num_hash_functions=8, window_size=32,
        min_table_hits=2, batchsize=4, probe_cap=8,
        candidates_per_read_cap=8, max_read_length=16,
        max_hamming_percent=0.1)
    rng = random.Random(4)
    chrom = "".join(rng.choice("ACGT") for _ in range(30))
    want = reference_pipeline.coarse_map(
        [oracle.encode_bases(chrom)],
        [oracle.encode_bases(chrom[5:20])], opts)
    res = _map([chrom], [chrom[5:20]], opts)
    assert res.orientation[0] == want[0].orientation
    if want[0].orientation != oracle.NONE:
        assert res.position[0] + res.shift[0] == 5


@pytest.mark.parametrize("k", [9, 13])
def test_odd_k_matches_oracle(k):
    rng = random.Random(k)
    chrom = "".join(rng.choice("ACGT") for _ in range(500))
    reads = []
    for _ in range(20):
        s = rng.randrange(470)
        b = oracle.encode_bases(chrom[s:s + 24])
        if rng.random() < 0.5:
            b = oracle.revcomp_bases(b)
        reads.append(b)
    opts = ProgramOptions(
        kmer_length=k, num_hash_functions=8, window_size=48,
        min_table_hits=2, batchsize=8, max_hamming_percent=0.1,
        probe_cap=64, candidates_per_read_cap=32, max_read_length=24)
    want = reference_pipeline.coarse_map(
        [oracle.encode_bases(chrom)], reads, opts)
    res = _map([chrom], [oracle.decode_bases(r) for r in reads], opts)
    for i, w in enumerate(want):
        assert res.orientation[i] == w.orientation, (k, i)
        if w.orientation != oracle.NONE:
            assert res.position[i] == w.position
            assert res.shift[i] == w.shift
