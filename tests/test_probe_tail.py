"""Two-tier probe value gather (probe_tail_budget) equivalence."""

import numpy as np
import jax.numpy as jnp
import pytest

from hashreadmapper_tpu.config import ProgramOptions
from hashreadmapper_tpu.index import minhash_index as mi
from hashreadmapper_tpu.io.genome import Genome
from hashreadmapper_tpu.pipeline.engine import CoarseMapper

SENT = np.uint32(0xFFFFFFFF)


def make_index(rng, n_items=5000, f=8, heavy_keys=6, heavy_vals=12):
    """CSR index with a few heavy keys (many values) per table."""
    sigs = rng.integers(0, 2**32, size=(n_items, f), dtype=np.uint32)
    for t in range(f):
        for h in range(heavy_keys):
            rows = rng.choice(n_items, size=heavy_vals, replace=False)
            sigs[rows, t] = np.uint32(1000 + h)
    valid = np.ones(n_items, bool)
    idx = mi.build_csr_index(sigs, valid, 16, np.arange(f, dtype=np.uint32))
    idx.build_buckets()
    return idx, sigs


@pytest.mark.parametrize("fnc", [False, True])
def test_tail_budget_matches_full(fnc):
    rng = np.random.default_rng(7)
    idx, sigs = make_index(rng)
    queries = jnp.asarray(sigs[:512])      # self-probe: every query hits
    valid = jnp.ones(512, bool)
    full = mi.probe_tables(idx.keys, idx.offsets, idx.values, idx.num_keys,
                           queries, valid, 16,
                           bucket_start=idx.bucket_start,
                           probe_steps=idx.probe_steps, fnc_layout=fnc)
    tiered = mi.probe_tables(idx.keys, idx.offsets, idx.values, idx.num_keys,
                             queries, valid, 16,
                             bucket_start=idx.bucket_start,
                             probe_steps=idx.probe_steps, fnc_layout=fnc,
                             tail_budget=1024)
    cand0, cnt0 = full
    cand1, cnt1, drops, hdrops = tiered
    assert int(drops) == 0 and int(hdrops) == 0
    np.testing.assert_array_equal(np.asarray(cand0), np.asarray(cand1))
    np.testing.assert_array_equal(np.asarray(cnt0), np.asarray(cnt1))
    # found-compacted head gather: exact while within budget
    compacted = mi.probe_tables(
        idx.keys, idx.offsets, idx.values, idx.num_keys,
        queries, valid, 16, bucket_start=idx.bucket_start,
        probe_steps=idx.probe_steps, fnc_layout=fnc,
        tail_budget=1024, head_budget=512 * idx.num_tables)
    cand2, cnt2, drops2, hdrops2 = compacted
    assert int(drops2) == 0 and int(hdrops2) == 0
    np.testing.assert_array_equal(np.asarray(cand0), np.asarray(cand2))
    np.testing.assert_array_equal(np.asarray(cnt0), np.asarray(cnt2))


def test_tail_budget_overflow_counted():
    rng = np.random.default_rng(8)
    idx, sigs = make_index(rng, heavy_keys=40, heavy_vals=12)
    # probe WITH the heavy keys so count>4 probes are plentiful
    queries = np.full((256, idx.num_tables), 0, dtype=np.uint32)
    for t in range(idx.num_tables):
        queries[:, t] = 1000 + (np.arange(256) % 40)
    cand, cnt, drops, _hd = mi.probe_tables(
        idx.keys, idx.offsets, idx.values, idx.num_keys,
        jnp.asarray(queries), jnp.ones(256, bool), 16,
        bucket_start=idx.bucket_start, probe_steps=idx.probe_steps,
        tail_budget=8)
    assert int(drops) > 0
    # dropped probes keep their head values: first 4 slots always filled
    c = np.asarray(cand)
    hit = np.asarray(cnt) > 4
    assert (c[hit][:, :4] != SENT).all()


def test_engine_tail_budget_end_to_end():
    rng = np.random.default_rng(9)
    chrom_bases = rng.integers(0, 4, size=300_000, dtype=np.int8)
    genome = Genome(["chrT"],
                    ["".join(np.array(list("ACGT"))[chrom_bases])])
    starts = rng.integers(0, 300_000 - 100, size=256)
    reads = chrom_bases[starts[:, None] + np.arange(100)[None, :]].copy()
    lengths = np.full(256, 100, dtype=np.int32)
    base = dict(kmer_length=16, num_hash_functions=8, window_size=128,
                min_table_hits=2, batchsize=128, max_hamming_percent=0.05,
                probe_cap=16, candidates_per_read_cap=8, max_read_length=128)
    r0 = CoarseMapper(genome, ProgramOptions(**base)).map_reads(
        reads.astype(np.int8), lengths)
    r1 = CoarseMapper(genome, ProgramOptions(
        **base, probe_tail_budget_per_read=4)).map_reads(
        reads.astype(np.int8), lengths)
    assert r1.stats["probe_tail_overflow"] == 0
    for f in ("orientation", "hamming", "position", "global_window_id"):
        np.testing.assert_array_equal(getattr(r0, f), getattr(r1, f),
                                      err_msg=f)


def test_engine_head_budget_end_to_end():
    rng = np.random.default_rng(10)
    chrom_bases = rng.integers(0, 4, size=300_000, dtype=np.int8)
    genome = Genome(["chrT"],
                    ["".join(np.array(list("ACGT"))[chrom_bases])])
    starts = rng.integers(0, 300_000 - 100, size=256)
    reads = chrom_bases[starts[:, None] + np.arange(100)[None, :]].copy()
    # half junk reads: plenty of probe misses for the compaction to skip
    reads[128:] = rng.integers(0, 4, size=(128, 100), dtype=np.int8)
    lengths = np.full(256, 100, dtype=np.int32)
    base = dict(kmer_length=16, num_hash_functions=8, window_size=128,
                min_table_hits=2, batchsize=128, max_hamming_percent=0.05,
                probe_cap=16, candidates_per_read_cap=8, max_read_length=128)
    r0 = CoarseMapper(genome, ProgramOptions(
        **base, probe_tail_budget_per_read=4)).map_reads(
        reads.astype(np.int8), lengths)
    r1 = CoarseMapper(genome, ProgramOptions(
        **base, probe_tail_budget_per_read=4,
        probe_head_budget_per_read=8)).map_reads(
        reads.astype(np.int8), lengths)
    assert r1.stats["probe_head_overflow"] == 0
    for f in ("orientation", "hamming", "position", "global_window_id"):
        np.testing.assert_array_equal(getattr(r0, f), getattr(r1, f),
                                      err_msg=f)
    # a starved budget must COUNT what it drops (never silently)
    r2 = CoarseMapper(genome, ProgramOptions(
        **base, probe_tail_budget_per_read=4,
        probe_head_budget_per_read=1)).map_reads(
        reads.astype(np.int8), lengths)
    assert r2.stats["probe_head_overflow"] > 0
