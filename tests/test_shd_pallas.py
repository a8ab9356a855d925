"""Pallas bit-plane SHD == one-hot scan SHD (bit-identical)."""

import random

import jax.numpy as jnp
import numpy as np

from hashreadmapper_tpu.ops import shd
from hashreadmapper_tpu.ops.shd_pallas import pack_bitplanes


def test_pack_bitplanes():
    bases = jnp.array([[0, 1, 2, 3] * 20], dtype=jnp.int8)  # 80 bases
    hi, lo, mask = pack_bitplanes(bases, jnp.array([70], dtype=jnp.int32), 3)
    hi, lo, mask = np.asarray(hi), np.asarray(lo), np.asarray(mask)
    for pos in range(96):
        w, b = pos // 32, pos % 32
        if pos < 70:
            base = [0, 1, 2, 3][pos % 4]
            assert (hi[0, w] >> b) & 1 == base >> 1, pos
            assert (lo[0, w] >> b) & 1 == base & 1, pos
            assert (mask[0, w] >> b) & 1 == 1, pos
        else:
            assert (hi[0, w] >> b) & 1 == 0, pos
            assert (lo[0, w] >> b) & 1 == 0, pos
            assert (mask[0, w] >> b) & 1 == 0, pos


def test_bitplane_matches_onehot():
    rng = random.Random(0)
    window_size = 48
    max_read_len = 32
    genome = [rng.randrange(4) for _ in range(800)]
    chrom_len = len(genome)

    pairs = []
    for _ in range(150):
        pos = rng.randrange(0, chrom_len - 4)
        rl = rng.randint(6, max_read_len)
        if rng.random() < 0.6:
            src = rng.randrange(0, chrom_len - rl)
            read = genome[src:src + rl]
            if rng.random() < 0.5:
                read = [3 - b for b in reversed(read)]
            for _ in range(rng.randint(0, 2)):
                read[rng.randrange(rl)] = rng.randrange(4)
        else:
            read = [rng.randrange(4) for _ in range(rl)]
        pairs.append((pos, read))

    p = len(pairs)
    pos_arr = jnp.array([x[0] for x in pairs], dtype=jnp.int32)
    rl_arr = jnp.array([len(x[1]) for x in pairs], dtype=jnp.int32)
    reads = np.zeros((p, max_read_len), dtype=np.int8)
    for i, (_, r) in enumerate(pairs):
        reads[i, :len(r)] = r

    loc = shd.extended_window_location(
        pos_arr, jnp.full((p,), chrom_len, dtype=jnp.int32), rl_arr,
        window_size)
    params = shd.ShdParams(window_size=window_size,
                           max_ext_len=window_size + max_read_len,
                           max_read_len=max_read_len,
                           max_hamming_percent=0.3)
    args = (jnp.array(genome, dtype=jnp.int8), loc.start, loc.length,
            loc.left, jnp.array(reads), rl_arr,
            jnp.ones((p,), dtype=bool), params)
    want = shd.shd_pairs(*args)
    got = shd.shd_pairs_bitplane(*args)
    np.testing.assert_array_equal(np.asarray(got.orientation),
                                  np.asarray(want.orientation))
    np.testing.assert_array_equal(np.asarray(got.hamming),
                                  np.asarray(want.hamming))
    np.testing.assert_array_equal(np.asarray(got.shift),
                                  np.asarray(want.shift))


def test_packed_genome_matches_unpacked():
    import jax.numpy as jnp
    from hashreadmapper_tpu.ops import shd_pallas

    rng = random.Random(5)
    window_size = 48
    max_read_len = 32
    genome = [rng.randrange(4) for _ in range(1000)]
    chrom_len = len(genome)

    pairs = []
    for _ in range(200):
        pos = rng.randrange(0, chrom_len - 4)
        rl = rng.randint(6, max_read_len)
        if rng.random() < 0.6:
            src = rng.randrange(0, chrom_len - rl)
            read = genome[src:src + rl]
            if rng.random() < 0.5:
                read = [3 - b for b in reversed(read)]
        else:
            read = [rng.randrange(4) for _ in range(rl)]
        pairs.append((pos, read))

    p = len(pairs)
    pos_arr = jnp.array([x[0] for x in pairs], dtype=jnp.int32)
    rl_arr = jnp.array([len(x[1]) for x in pairs], dtype=jnp.int32)
    reads = np.zeros((p, max_read_len), dtype=np.int8)
    for i, (_, r) in enumerate(pairs):
        reads[i, :len(r)] = r
    valid = np.ones(p, dtype=bool)
    valid[3] = False

    loc = shd.extended_window_location(
        pos_arr, jnp.full((p,), chrom_len, dtype=jnp.int32), rl_arr,
        window_size)
    params = shd.ShdParams(window_size=window_size,
                           max_ext_len=window_size + max_read_len,
                           max_read_len=max_read_len,
                           max_hamming_percent=0.3)
    gconcat = jnp.array(genome, dtype=jnp.int8)
    g_hi, g_lo = shd_pallas.pack_genome_planes(gconcat)

    for three_n in (False, True):
        if three_n:
            want = shd.shd_pairs_bitplane_3n(
                gconcat, loc.start, loc.length, loc.left,
                jnp.array(reads), rl_arr, jnp.array(valid), params)
        else:
            want = shd.shd_pairs_bitplane(
                gconcat, loc.start, loc.length, loc.left,
                jnp.array(reads), rl_arr, jnp.array(valid), params)
        got = shd.shd_pairs_packed(
            g_hi, g_lo, jnp.int32(chrom_len), loc.start, loc.length,
            loc.left, jnp.array(reads), rl_arr, jnp.array(valid), params,
            three_n=three_n)
        np.testing.assert_array_equal(np.asarray(got.orientation),
                                      np.asarray(want.orientation))
        np.testing.assert_array_equal(np.asarray(got.hamming),
                                      np.asarray(want.hamming))
        np.testing.assert_array_equal(np.asarray(got.shift),
                                      np.asarray(want.shift))
