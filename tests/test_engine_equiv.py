"""Engine dispatch-variant equivalences."""

def test_map_pool_scanned_matches_loop():
    """map_pool_scanned (one-dispatch lax.scan over the pool) is
    bit-identical to the per-batch dispatch loop."""
    import numpy as np
    import jax.numpy as jnp
    from hashreadmapper_tpu.config import ProgramOptions
    from hashreadmapper_tpu.io.genome import Genome
    from hashreadmapper_tpu.pipeline.engine import CoarseMapper

    rng = np.random.default_rng(4)
    gb = rng.integers(0, 4, size=300_000, dtype=np.int8)
    genome = Genome(["c"], ["".join(np.array(list("ACGT"))[gb])])
    n = 256
    starts = rng.integers(0, 300_000 - 100, size=n)
    reads = gb[starts[:, None] + np.arange(100)[None, :]].copy()
    conv = (reads == 1) & (rng.random(reads.shape) < 0.9)
    reads[conv] = 3
    opts = ProgramOptions(
        kmer_length=16, num_hash_functions=8, window_size=128,
        min_table_hits=2, batchsize=128, max_hamming_percent=0.05,
        probe_cap=16, candidates_per_read_cap=8, max_read_length=128,
        three_n_seeding=True, shd_pairs_per_read_budget=4,
        probe_tail_budget_per_read=4, probe_head_budget_per_read=18)
    m = CoarseMapper(genome, opts)
    m.ensure_empty_drops()
    padded = np.pad(reads, ((0, 0), (0, 28))).astype(np.int8)
    ab, al, av, n_pad = m.stage_reads_device(padded,
                                             np.full(n, 100, np.int32))
    p1, o1, _ = m._map_reads_device(ab, al, av, n_pad, 128)
    p2, o2 = m.map_pool_scanned(ab, al, av, n_pad, 128)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
