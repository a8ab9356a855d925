"""SHD pair compaction (shd_pairs_per_read_budget) equivalence.

With a sufficient budget the compacted path must be bit-identical to the
full [B, K] evaluation; with a starving budget the dropped pairs are
counted in pair_budget_overflow and results stay well-formed.
"""

import dataclasses

import numpy as np
import pytest

from hashreadmapper_tpu.config import ProgramOptions
from hashreadmapper_tpu.io.genome import Genome
from hashreadmapper_tpu.pipeline.engine import CoarseMapper


def make_case(three_n, n_reads=256, genome_len=200_000, read_len=100,
              seed=11):
    rng = np.random.default_rng(seed)
    chrom_bases = rng.integers(0, 4, size=genome_len, dtype=np.int8)
    chrom = "".join(np.array(list("ACGT"))[chrom_bases])
    genome = Genome(["chrP"], [chrom])
    starts = rng.integers(0, genome_len - read_len, size=n_reads)
    reads = chrom_bases[starts[:, None] + np.arange(read_len)[None, :]].copy()
    sub = rng.random(reads.shape) < 0.01
    reads[sub] = rng.integers(0, 4, size=int(sub.sum()))
    rc = rng.random(n_reads) < 0.5
    reads[rc] = 3 - reads[rc][:, ::-1]
    if three_n:
        conv = (reads == 1) & (rng.random(reads.shape) < 0.9)
        reads[conv] = 3
    lengths = np.full(n_reads, read_len, dtype=np.int32)
    return genome, reads.astype(np.int8), lengths


@pytest.mark.parametrize("three_n", [False, True])
def test_budget_matches_full(three_n):
    genome, reads, lengths = make_case(three_n)
    base = dict(kmer_length=16, num_hash_functions=8, window_size=128,
                min_table_hits=2, batchsize=128, max_hamming_percent=0.05,
                probe_cap=8, candidates_per_read_cap=8, max_read_length=128,
                three_n_seeding=three_n)
    full = CoarseMapper(genome, ProgramOptions(**base))
    res_full = full.map_reads(reads, lengths)
    assert res_full.stats["pair_budget_overflow"] == 0

    opts_b = ProgramOptions(**base, shd_pairs_per_read_budget=4)
    budget = CoarseMapper(genome, opts_b)
    res_b = budget.map_reads(reads, lengths)
    assert res_b.stats["pair_budget_overflow"] == 0, (
        "budget 4/read starved this workload; the equivalence claim only "
        "holds without drops")
    for f in ("orientation", "hamming", "shift", "chromosome_id",
              "position", "global_window_id"):
        np.testing.assert_array_equal(getattr(res_full, f),
                                      getattr(res_b, f), err_msg=f)


def test_budget_overflow_counted():
    # plant one 100bp sequence at four genome positions -> every read votes
    # >= 4 candidate windows, overflowing a 1/read budget
    rng = np.random.default_rng(5)
    chrom_bases = rng.integers(0, 4, size=200_000, dtype=np.int8)
    motif = rng.integers(0, 4, size=100, dtype=np.int8)
    for p in (1_000, 50_000, 100_000, 150_000):
        chrom_bases[p:p + 100] = motif
    genome = Genome(["chrO"], ["".join(np.array(list("ACGT"))[chrom_bases])])
    reads = np.repeat(motif[None, :], 128, axis=0).astype(np.int8)
    lengths = np.full(128, 100, dtype=np.int32)
    opts = ProgramOptions(
        kmer_length=16, num_hash_functions=8, window_size=128,
        min_table_hits=1, batchsize=128, max_hamming_percent=0.5,
        probe_cap=8, candidates_per_read_cap=8, max_read_length=128,
        shd_pairs_per_read_budget=1)
    m = CoarseMapper(genome, opts)
    res = m.map_reads(reads, lengths)
    # every read voted >1 candidates (min_table_hits 1, repeats) but only
    # 1/read is budgeted across the batch: drops must be visible
    assert res.stats["pair_budget_overflow"] > 0
    # the surviving prefix still maps the reads (candidates are identical
    # across the repeated reads, the budget covers the first ones fully)
    assert (res.orientation != 3).any()
