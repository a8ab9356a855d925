"""CSR index probe + vote vs the oracle's dict-based index."""

import random

import jax.numpy as jnp
import numpy as np

from hashreadmapper_tpu.cpu import oracle
from hashreadmapper_tpu.index import minhash_index as mi


def _random_sigs(n, f, universe, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, universe, size=(n, f), dtype=np.uint32)


def test_probe_matches_bruteforce():
    n_items, n_queries, f = 200, 64, 8
    sigs_items = _random_sigs(n_items, f, 50, seed=0)   # small universe: collisions
    valid_items = np.ones(n_items, dtype=bool)
    valid_items[5] = False
    idx = mi.build_csr_index(sigs_items, valid_items, 16, list(range(f)))

    sigs_q = _random_sigs(n_queries, f, 60, seed=1)
    valid_q = np.ones(n_queries, dtype=bool)
    valid_q[3] = False
    cap = 64
    cand, counts = mi.probe_tables(
        idx.keys, idx.offsets, idx.values, idx.num_keys,
        jnp.asarray(sigs_q), jnp.asarray(valid_q), cap)
    cand, counts = np.asarray(cand), np.asarray(counts)

    for q in range(n_queries):
        for t in range(f):
            if not valid_q[q]:
                want = []
            else:
                want = sorted(
                    i for i in range(n_items)
                    if valid_items[i] and sigs_items[i, t] == sigs_q[q, t])
            assert counts[q, t] == len(want)
            got = [int(x) for x in cand[q, t] if x != mi.SENTINEL]
            assert got == want[:cap]


def test_probe_respects_max_values_per_key():
    f = 2
    sigs_items = np.zeros((10, f), dtype=np.uint32)
    sigs_items[:, 1] = np.arange(10)  # table 1: all distinct
    valid = np.ones(10, dtype=bool)
    idx = mi.build_csr_index(sigs_items, valid, 16, [0, 1],
                             max_values_per_key=5)
    # table 0 key 0 has 10 values > 5 -> dropped entirely
    sigs_q = np.zeros((1, f), dtype=np.uint32)
    cand, counts = mi.probe_tables(
        idx.keys, idx.offsets, idx.values, idx.num_keys,
        jnp.asarray(sigs_q), jnp.ones(1, dtype=bool), 16)
    assert int(np.asarray(counts)[0, 0]) == 0
    assert int(np.asarray(counts)[0, 1]) == 1
    assert int(np.asarray(cand)[0, 1, 0]) == 0


def test_dropped_keys_mask():
    f = 1
    sigs_items = np.array([[7], [8]], dtype=np.uint32)
    idx = mi.build_csr_index(sigs_items, np.ones(2, bool), 16, [0])
    dk, dn = mi.build_dropped_keys(
        np.array([[7]] * 3 + [[8]], dtype=np.uint32), np.ones(4, bool),
        max_values_per_key=2)
    sigs_q = np.array([[7], [8]], dtype=np.uint32)
    cand, counts = mi.probe_tables(
        idx.keys, idx.offsets, idx.values, idx.num_keys,
        jnp.asarray(sigs_q), jnp.ones(2, bool), 4,
        dropped_keys=(jnp.asarray(dk), jnp.asarray(dn)))
    counts = np.asarray(counts)
    assert counts[0, 0] == 0  # key 7 dropped (3 > 2)
    assert counts[1, 0] == 1


def test_vote_matches_oracle():
    rng = random.Random(0)
    n_items, n_queries, f = 300, 128, 16
    sigs_items = _random_sigs(n_items, f, 40, seed=2)
    valid_items = np.ones(n_items, dtype=bool)
    sigs_q = _random_sigs(n_queries, f, 40, seed=3)
    idx = mi.build_csr_index(sigs_items, valid_items, 16, list(range(f)))

    # oracle index
    oidx = oracle.build_index_from_signatures(
        [list(s) for s in sigs_items], f, max_values_per_key=10**9)

    cap = 32
    cand, counts = mi.probe_tables(
        idx.keys, idx.offsets, idx.values, idx.num_keys,
        jnp.asarray(sigs_q), jnp.ones(n_queries, bool), cap)
    assert int(np.asarray(counts).max()) <= cap, "raise cap for this test"

    for min_hits in (1, 4, 8):
        out_cap = 512
        ids, cnts, kept = mi.vote_candidates(cand, min_hits, out_cap)
        ids, kept = np.asarray(ids), np.asarray(kept)
        for q in range(n_queries):
            want = oracle.query_candidates(oidx, list(sigs_q[q]), min_hits)
            got = [int(x) for x in ids[q] if x != mi.SENTINEL]
            assert got == want, (q, min_hits)
            assert kept[q] == len(want)


def test_vote_overflow_cap():
    cand = jnp.asarray(
        np.arange(10, dtype=np.uint32).reshape(1, 1, 10))
    ids, cnts, kept = mi.vote_candidates(cand, 1, 4)
    assert int(np.asarray(kept)[0]) == 10
    assert [int(x) for x in np.asarray(ids)[0]] == [0, 1, 2, 3]


def test_index_save_load(tmp_path):
    sigs = _random_sigs(50, 4, 100, seed=5)
    idx = mi.build_csr_index(sigs, np.ones(50, bool), 16, [0, 1, 2, 3])
    p = str(tmp_path / "index.npz")
    idx.save(p)
    loaded = mi.CsrIndex.load(p)
    assert (np.asarray(loaded.keys) == np.asarray(idx.keys)).all()
    assert (np.asarray(loaded.values) == np.asarray(idx.values)).all()
    assert loaded.kmer_length == 16
