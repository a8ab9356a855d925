"""Cuckoo direct-probe table == bucketed binary search."""

import numpy as np
import jax.numpy as jnp
import pytest

from hashreadmapper_tpu import native
from hashreadmapper_tpu.index import minhash_index as mi

SENT = np.uint32(0xFFFFFFFF)

needs_native = pytest.mark.skipif(
    native.cuckoo_build(np.zeros(0, np.uint32), 8, 0, 0) is None,
    reason="native cuckoo builder unavailable")


def make_index(rng, n_items=4000, f=8, heavy=8):
    sigs = rng.integers(0, 2**31, size=(n_items, f), dtype=np.uint32)
    for t in range(f):
        for h in range(heavy):
            rows = rng.choice(n_items, size=10, replace=False)
            sigs[rows, t] = np.uint32(7000 + h)
    idx = mi.build_csr_index(sigs, np.ones(n_items, bool), 16,
                             np.arange(f, dtype=np.uint32))
    idx.build_buckets()
    assert idx.build_cuckoo()
    return idx, sigs


@needs_native
@pytest.mark.parametrize("tail_budget", [0, 512])
def test_cuckoo_matches_binary(tail_budget):
    rng = np.random.default_rng(31)
    idx, sigs = make_index(rng)
    n = 512
    queries = sigs[:n].copy()
    queries[::3] = rng.integers(0, 2**31, size=queries[::3].shape,
                                dtype=np.uint32)   # mostly misses
    q = jnp.asarray(queries)
    v = jnp.ones(n, bool)
    kw = dict(bucket_start=idx.bucket_start, probe_steps=idx.probe_steps,
              tail_budget=tail_budget)
    a = mi.probe_tables(idx.keys, idx.offsets, idx.values, idx.num_keys,
                        q, v, 16, **kw)
    b = mi.probe_tables(idx.keys, idx.offsets, idx.values, idx.num_keys,
                        q, v, 16, cuckoo=(idx.cuckoo_keys,
                                          idx.cuckoo_payload),
                        cuckoo_bits=idx.cuckoo_bits,
                        cuckoo_seeds=idx.cuckoo_seeds, **kw)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    if tail_budget:
        assert int(a[2]) == int(b[2]) == 0


@needs_native
def test_cuckoo_with_dropped_keys():
    rng = np.random.default_rng(33)
    idx, sigs = make_index(rng)
    n = 256
    q = jnp.asarray(sigs[:n])
    v = jnp.ones(n, bool)
    dk, dn = mi.build_dropped_keys(sigs[:n], np.ones(n, bool), 2)
    kw = dict(dropped_keys=(jnp.asarray(dk), jnp.asarray(dn)),
              bucket_start=idx.bucket_start, probe_steps=idx.probe_steps)
    a = mi.probe_tables(idx.keys, idx.offsets, idx.values, idx.num_keys,
                        q, v, 16, **kw)
    b = mi.probe_tables(idx.keys, idx.offsets, idx.values, idx.num_keys,
                        q, v, 16, cuckoo=(idx.cuckoo_keys,
                                          idx.cuckoo_payload),
                        cuckoo_bits=idx.cuckoo_bits,
                        cuckoo_seeds=idx.cuckoo_seeds, **kw)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


@needs_native
def test_cuckoo_count_saturation():
    """Keys with >1023 values: saturated counts still gather probe_cap
    values and still register in the counts>probe_cap overflow stat."""
    rng = np.random.default_rng(35)
    n_items = 3000
    sigs = rng.integers(0, 2**31, size=(n_items, 2), dtype=np.uint32)
    sigs[:2000, 0] = 5          # one key with 2000 values in table 0
    idx = mi.build_csr_index(sigs, np.ones(n_items, bool), 16,
                             np.arange(2, dtype=np.uint32))
    idx.build_buckets()
    assert idx.build_cuckoo()
    q = jnp.asarray(np.array([[5, sigs[0, 1]]], dtype=np.uint32))
    cand, counts = mi.probe_tables(
        idx.keys, idx.offsets, idx.values, idx.num_keys, q,
        jnp.ones(1, bool), 8, cuckoo=(idx.cuckoo_keys, idx.cuckoo_payload),
        cuckoo_bits=idx.cuckoo_bits, cuckoo_seeds=idx.cuckoo_seeds)
    assert int(counts[0, 0]) == 1023          # saturated, > probe_cap
    assert (np.asarray(cand[0, 0]) != SENT).all()  # 8 values gathered
    # values are the first 8 ids carrying key 5 (ascending)
    want = np.sort(np.nonzero(sigs[:, 0] == 5)[0])[:8].astype(np.uint32)
    np.testing.assert_array_equal(np.asarray(cand[0, 0]), want)
