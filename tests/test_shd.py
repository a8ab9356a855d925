"""Device SHD + extended-window math vs the oracle."""

import random

import jax.numpy as jnp
import numpy as np

from hashreadmapper_tpu.cpu import oracle
from hashreadmapper_tpu.ops import shd


def _rand_bases(rng, n):
    return [rng.randrange(4) for _ in range(n)]


def test_extended_window_location_matches_oracle():
    rng = random.Random(0)
    window_size = 32
    cases = []
    for _ in range(200):
        chrom_len = rng.randint(20, 200)
        pos = rng.randrange(0, max(1, chrom_len))
        read_len = rng.randint(4, 40)
        cases.append((chrom_len, pos, read_len))
    chrom_len = jnp.array([c[0] for c in cases], dtype=jnp.int32)
    pos = jnp.array([c[1] for c in cases], dtype=jnp.int32)
    read_len = jnp.array([c[2] for c in cases], dtype=jnp.int32)
    loc = shd.extended_window_location(pos, chrom_len, read_len, window_size)
    start = np.asarray(loc.start)
    left = np.asarray(loc.left)
    length = np.asarray(loc.length)
    for i, (cl, p, rl) in enumerate(cases):
        want = oracle.extended_window_location(cl, p, window_size, rl // 2)
        assert left[i] == want.left, (cl, p, rl)
        assert start[i] == want.start
        assert length[i] == want.length


def test_shd_matches_oracle():
    rng = random.Random(1)
    window_size = 48
    max_read_len = 24
    genome = _rand_bases(rng, 600)
    chrom_len = len(genome)

    pairs = []
    for _ in range(120):
        pos = rng.randrange(0, chrom_len - 4)
        read_len = rng.randint(6, max_read_len)
        # mix: random reads (no alignment) and planted reads (aligned)
        if rng.random() < 0.6:
            src = rng.randrange(0, chrom_len - read_len)
            read = genome[src:src + read_len]
            if rng.random() < 0.5:  # plant the RC
                read = [3 - b for b in reversed(read)]
            # sprinkle up to 2 mismatches
            for _ in range(rng.randint(0, 2)):
                i = rng.randrange(read_len)
                read[i] = rng.randrange(4)
        else:
            read = _rand_bases(rng, read_len)
        pairs.append((pos, read))

    p = len(pairs)
    pos_arr = jnp.array([x[0] for x in pairs], dtype=jnp.int32)
    read_len_arr = jnp.array([len(x[1]) for x in pairs], dtype=jnp.int32)
    reads = np.zeros((p, max_read_len), dtype=np.int8)
    for i, (_, r) in enumerate(pairs):
        reads[i, :len(r)] = r

    loc = shd.extended_window_location(
        pos_arr, jnp.full((p,), chrom_len, dtype=jnp.int32),
        read_len_arr, window_size)
    params = shd.ShdParams(window_size=window_size,
                           max_ext_len=window_size + max_read_len,
                           max_read_len=max_read_len,
                           max_hamming_percent=0.25)
    res = shd.shd_pairs(
        jnp.array(genome, dtype=jnp.int8),
        loc.start, loc.length, loc.left,
        jnp.array(reads), read_len_arr,
        jnp.ones((p,), dtype=bool), params)

    ham = np.asarray(res.hamming)
    shf = np.asarray(res.shift)
    ori = np.asarray(res.orientation)
    starts = np.asarray(loc.start)
    lengths = np.asarray(loc.length)
    lefts = np.asarray(loc.left)

    for i, (pos, read) in enumerate(pairs):
        anchor = genome[starts[i]:starts[i] + lengths[i]]
        want = oracle.shifted_hamming_distance(anchor, read, 0.25)
        assert ori[i] == want.orientation, (i, pos, read)
        if want.orientation != oracle.NONE:
            assert ham[i] == want.score, i
            assert shf[i] == want.shift - lefts[i], i


def test_shd_read_longer_than_anchor():
    genome = jnp.array([0, 1, 2, 3] * 4, dtype=jnp.int8)
    params = shd.ShdParams(window_size=4, max_ext_len=12, max_read_len=10,
                           max_hamming_percent=0.5)
    res = shd.shd_pairs(
        genome,
        jnp.array([0], dtype=jnp.int32),   # anchor start
        jnp.array([5], dtype=jnp.int32),   # anchor length 5
        jnp.array([0], dtype=jnp.int32),
        jnp.array([[0, 1, 2, 3, 0, 1, 2, 3, 0, 1]], dtype=jnp.int8),
        jnp.array([10], dtype=jnp.int32),  # read length 10 > anchor 5
        jnp.array([True]),
        params)
    assert int(np.asarray(res.orientation)[0]) == shd.NONE
    assert int(np.asarray(res.hamming)[0]) == 10
    assert int(np.asarray(res.shift)[0]) == 0


def test_shd_invalid_pair_masked():
    genome = jnp.zeros((64,), dtype=jnp.int8)
    params = shd.ShdParams(window_size=8, max_ext_len=16, max_read_len=8,
                           max_hamming_percent=1.0)
    res = shd.shd_pairs(
        genome,
        jnp.array([0], dtype=jnp.int32), jnp.array([16], dtype=jnp.int32),
        jnp.array([0], dtype=jnp.int32),
        jnp.zeros((1, 8), dtype=jnp.int8), jnp.array([8], dtype=jnp.int32),
        jnp.array([False]), params)
    assert int(np.asarray(res.orientation)[0]) == shd.NONE
