"""Pallas fused vote == XLA vote_candidates, bit-identical.

Runs in interpret mode on the CPU test backend (conftest forces cpu).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hashreadmapper_tpu.index import minhash_index as mi
from hashreadmapper_tpu.ops import vote_pallas

SENT = np.uint32(0xFFFFFFFF)


def make_cand(rng, n, f, c, density=0.2, id_range=5000):
    """[N, F, C] uint32 ascending-per-(n,f) lists with SENTINEL padding,
    duplicated ids across tables so min_table_hits has something to vote."""
    counts = rng.binomial(c, density, size=(n, f))
    # draw ids from a narrow pool so cross-table repeats happen
    out = np.full((n, f, c), SENT, dtype=np.uint32)
    for i in range(n):
        pool = rng.integers(0, id_range, size=16)
        for t in range(f):
            k = counts[i, t]
            if k:
                vals = np.unique(rng.choice(pool, size=k))
                out[i, t, :len(vals)] = np.sort(vals).astype(np.uint32)
    return out


@pytest.mark.parametrize("n,f,c,min_hits,cap", [
    (128, 16, 8, 4, 8),
    (256, 32, 16, 4, 8),    # 3N shape: 2F tables
    (128, 12, 4, 2, 4),     # non-power-of-two table count
    (128, 16, 8, 1, 8),     # min_hits == 1 path
])
def test_vote_pallas_matches_xla(n, f, c, min_hits, cap):
    rng = np.random.default_rng(n + f + c)
    cand = make_cand(rng, n, f, c)
    ids0, cnt0, nk0 = mi.vote_candidates(jnp.asarray(cand), min_hits, cap)
    ids1, cnt1, nk1 = vote_pallas.vote_candidates_fnc(
        jnp.asarray(cand).transpose(1, 0, 2), min_hits, cap,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(ids0), np.asarray(ids1))
    np.testing.assert_array_equal(np.asarray(cnt0), np.asarray(cnt1))
    np.testing.assert_array_equal(np.asarray(nk0), np.asarray(nk1))


def test_vote_pallas_empty_and_full():
    n, f, c, cap = 128, 8, 8, 8
    # all-SENTINEL input -> nothing kept
    cand = np.full((n, f, c), SENT, dtype=np.uint32)
    ids, cnt, nk = vote_pallas.vote_candidates_fnc(
        jnp.asarray(cand).transpose(1, 0, 2), 4, cap, interpret=True)
    assert (np.asarray(ids) == SENT).all()
    assert (np.asarray(nk) == 0).all()
    # one id present in every table of every read -> kept with count f
    cand = np.full((n, f, c), SENT, dtype=np.uint32)
    cand[:, :, 0] = 7
    ids, cnt, nk = vote_pallas.vote_candidates_fnc(
        jnp.asarray(cand).transpose(1, 0, 2), 4, cap, interpret=True)
    assert (np.asarray(ids)[:, 0] == 7).all()
    assert (np.asarray(cnt)[:, 0] == f).all()
    assert (np.asarray(nk) == 1).all()


def test_vote_pallas_overflow_num_kept():
    """num_kept beyond out_cap is still reported (overflow accounting)."""
    n, f, c, cap = 128, 8, 8, 2
    cand = np.full((n, f, c), SENT, dtype=np.uint32)
    # 5 distinct ids, each in every table
    for j in range(5):
        cand[:, :, j] = 10 + j
    ids, cnt, nk = vote_pallas.vote_candidates_fnc(
        jnp.asarray(cand).transpose(1, 0, 2), 2, cap, interpret=True)
    assert (np.asarray(nk) == 5).all()
    assert (np.asarray(ids)[:, 0] == 10).all()
    assert (np.asarray(ids)[:, 1] == 11).all()
