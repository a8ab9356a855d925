"""u64 pair arithmetic and murmur64 vs python-int oracle."""

import random

import jax.numpy as jnp
import numpy as np

from hashreadmapper_tpu.ops import u64


def _rand64(n, seed=0):
    rng = random.Random(seed)
    return [rng.getrandbits(64) for _ in range(n)]


def _to_pair(xs):
    hi = jnp.array([(x >> 32) & 0xFFFFFFFF for x in xs], dtype=jnp.uint32)
    lo = jnp.array([x & 0xFFFFFFFF for x in xs], dtype=jnp.uint32)
    return hi, lo


def _from_pair(pair):
    hi, lo = np.asarray(pair[0]), np.asarray(pair[1])
    return [(int(h) << 32) | int(l) for h, l in zip(hi, lo)]


def test_mul_const():
    xs = _rand64(256) + [0, 1, (1 << 64) - 1, 0xFFFFFFFF, 1 << 32]
    c = 0xFF51AFD7ED558CCD
    got = _from_pair(u64.mul_const(_to_pair(xs), c))
    want = [(x * c) & ((1 << 64) - 1) for x in xs]
    assert got == want


def test_shr_shl():
    xs = _rand64(64, seed=1)
    for n in [0, 1, 31, 32, 33, 63]:
        got = _from_pair(u64.shr(_to_pair(xs), n))
        assert got == [x >> n for x in xs], f"shr {n}"
        got = _from_pair(u64.shl(_to_pair(xs), n))
        assert got == [(x << n) & ((1 << 64) - 1) for x in xs], f"shl {n}"


def test_add_u32_carry():
    xs = [0xFFFFFFFF, 0xFFFFFFFFFFFFFFFF, 5, 1 << 32]
    b = jnp.array([1, 1, 63, 7], dtype=jnp.uint32)
    got = _from_pair(u64.add_u32(_to_pair(xs), b))
    want = [(x + int(v)) & ((1 << 64) - 1) for x, v in zip(xs, np.asarray(b))]
    assert got == want


def test_murmur64_matches_python():
    xs = _rand64(512, seed=2) + [0, 1, 2, (1 << 64) - 1]
    got = _from_pair(u64.murmur64(_to_pair(xs)))
    want = [u64.murmur64_py(x) for x in xs]
    assert got == want


def test_minimum_and_less():
    xs = _rand64(128, seed=3)
    ys = _rand64(128, seed=4)
    lt = np.asarray(u64.less(_to_pair(xs), _to_pair(ys)))
    assert list(lt) == [x < y for x, y in zip(xs, ys)]
    mn = _from_pair(u64.minimum(_to_pair(xs), _to_pair(ys)))
    assert mn == [min(x, y) for x, y in zip(xs, ys)]
