"""--memHashtables / --memTotal enforcement.

The reference sizes its hash-table count to the memHashtables budget and
errors under mustUseAllHashfunctions when the budget cannot fit the request
(reference: src/gpu/gpuminhasherconstruction.cu:123-147); memoryTotalLimit
bounds device residency, with reads spilling to host and streaming through
a bounded pool (reference: include/gpu/multigpureadstorage.cuh host
overflow; src/gpu/gpuminhasherconstruction.cu:89-108 2-stream insert loop).
"""

import random

import numpy as np
import pytest

from hashreadmapper_tpu.config import ProgramOptions
from hashreadmapper_tpu.io.genome import Genome
from hashreadmapper_tpu.pipeline.engine import (
    CoarseMapper, plan_num_hash_functions)

from test_engine_equivalence import _make_genome, _make_reads, _opts


def test_plan_unlimited_keeps_all_tables():
    opts = _opts()
    assert plan_num_hash_functions(opts, 10_000) == opts.num_hash_functions


def test_plan_tight_budget_reduces_tables():
    opts = _opts(memory_for_hashtables=16 * 10_000 * 3 + 3 * 4096)
    assert plan_num_hash_functions(opts, 10_000) == 3


def test_plan_budget_never_below_one_table():
    opts = _opts(memory_for_hashtables=1)
    assert plan_num_hash_functions(opts, 10_000) == 1


def test_plan_must_use_all_raises():
    opts = _opts(memory_for_hashtables=1,
                 must_use_all_hash_functions=True)
    with pytest.raises(MemoryError):
        plan_num_hash_functions(opts, 10_000)


def test_plan_three_n_doubles_per_func_cost():
    budget = 16 * 10_000 * 4 + 4 * 4096
    n_parity = plan_num_hash_functions(
        _opts(memory_for_hashtables=budget), 10_000)
    n_3n = plan_num_hash_functions(
        _opts(memory_for_hashtables=budget, three_n_seeding=True), 10_000)
    assert n_parity == 4 and n_3n == 2


def _reads_arrays(reads, max_len):
    n = len(reads)
    bases = np.zeros((n, max_len), dtype=np.int8)
    lengths = np.zeros(n, dtype=np.int32)
    for i, r in enumerate(reads):
        bases[i, :len(r)] = r
        lengths[i] = len(r)
    return bases, lengths


def test_mem_hashtables_budget_equals_explicit_reduced_f():
    """A budget fitting 4 of 8 tables must behave exactly like -m 4."""
    rng = random.Random(11)
    chroms = _make_genome(rng, [300])
    reads = _make_reads(rng, chroms, 60, (12, 30))
    bases, lengths = _reads_arrays(reads, 32)
    genome = Genome(names=["chr0"], sequences=chroms)

    opts_budget = _opts()
    n_win = genome.total_num_windows(
        opts_budget.kmer_length, opts_budget.window_size)
    opts_budget = _opts(memory_for_hashtables=4 * (16 * n_win + 4096))
    m_budget = CoarseMapper(genome, opts_budget)
    assert len(m_budget.hash_ids) == 4

    m_explicit = CoarseMapper(genome, _opts(num_hash_functions=4))
    got_b = m_budget.map_reads(bases, lengths)
    got_e = m_explicit.map_reads(bases, lengths)
    np.testing.assert_array_equal(got_b.orientation, got_e.orientation)
    np.testing.assert_array_equal(got_b.hamming, got_e.hamming)
    np.testing.assert_array_equal(got_b.position, got_e.position)


def test_mem_total_streaming_pool_identical_results():
    """A tight --memTotal forces multi-chunk read streaming; results must be
    bit-identical to the single-upload path."""
    rng = random.Random(5)
    chroms = _make_genome(rng, [400, 250])
    reads = _make_reads(rng, chroms, 200, (12, 30))
    bases, lengths = _reads_arrays(reads, 32)
    genome = Genome(names=["chr0", "chr1"],
                    sequences=chroms)

    m_full = CoarseMapper(genome, _opts())
    want = m_full.map_reads(bases, lengths)

    resident = m_full.resident_bytes()
    # budget for ~100 staged reads -> pool rounds down to one 64-read chunk
    per_read = 32 + 4 + 1 + 24 + 16
    opts_lim = _opts(memory_total_limit=resident + 100 * per_read)
    m_lim = CoarseMapper(genome, opts_lim)
    assert m_lim.read_pool_size(200, 32, 64) == 64  # 4 chunks of 64
    got = m_lim.map_reads(bases, lengths)

    np.testing.assert_array_equal(got.orientation, want.orientation)
    np.testing.assert_array_equal(got.hamming, want.hamming)
    np.testing.assert_array_equal(got.shift, want.shift)
    np.testing.assert_array_equal(got.chromosome_id, want.chromosome_id)
    np.testing.assert_array_equal(got.position, want.position)
    assert got.stats == want.stats


def test_read_pool_size_unlimited_is_whole_set():
    rng = random.Random(2)
    chroms = _make_genome(rng, [200])
    genome = Genome(names=["chr0"], sequences=chroms)
    m = CoarseMapper(genome, _opts())
    assert m.read_pool_size(130, 32, 64) == 192  # padded to batch multiple


def test_read_pool_size_floor_is_one_batch():
    rng = random.Random(2)
    chroms = _make_genome(rng, [200])
    genome = Genome(names=["chr0"], sequences=chroms)
    m = CoarseMapper(genome, _opts(memory_total_limit=1))
    assert m.read_pool_size(1000, 32, 64) == 64
