"""Pallas TPU kernel: bit-plane shifted-hamming-distance.

The TPU-native re-design of the reference's SHD hot kernel
(reference: src/gpu/hammingdistancekernels.cu:132-263).  The reference's
2-bit-HiLo layout (sequencehelpers.hpp:408-530) makes hamming distance a
popcount of plane XORs; here the planes live as int32 words with pairs on
the 128-wide lane axis and words on the sublane axis, so each (shift, word)
step is one VPU op across 128 pairs:

    mismatch_word = ((a_hi ^ r_hi) | (a_lo ^ r_lo)) & read_mask
    hamming(s)    = sum_w popcount(mismatch_word)

Sub-word shifts are built by combining adjacent anchor words; both
orientations are evaluated (the RC plane words are precomputed outside).
The kernel emits the full [P, 2, S] hamming matrix; threshold/argmin
post-processing stays in XLA so results are bit-identical to ops/shd.py's
one-hot scan (same tie rules).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_BIG16 = 0x7FFF


def pack_bitplanes(bases: jnp.ndarray, lengths: jnp.ndarray, nwords: int
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[N, L] int8 bases -> (hi, lo, mask) [N, nwords] int32 planes.

    Bit j of word w covers position w*32 + j.  mask has 1-bits exactly at
    positions < length (so XOR garbage past the end never counts).
    """
    n, maxlen = bases.shape
    width = nwords * 32
    b = bases.astype(jnp.int32)
    if width > maxlen:
        b = jnp.pad(b, ((0, 0), (0, width - maxlen)))
    else:
        b = b[:, :width]
    pos = jnp.arange(width, dtype=jnp.int32)[None, :]
    in_len = pos < lengths[:, None]
    hi_bits = jnp.where(in_len, (b >> 1) & 1, 0)
    lo_bits = jnp.where(in_len, b & 1, 0)
    shifts = jnp.arange(32, dtype=jnp.int32)[None, None, :]

    def to_words(bits):
        return jnp.sum(bits.reshape(n, nwords, 32) << shifts, axis=-1,
                       dtype=jnp.int32)

    return to_words(hi_bits), to_words(lo_bits), to_words(
        in_len.astype(jnp.int32))


def _shd_kernel(a_hi_ref, a_lo_ref, r_hi_ref, r_lo_ref, mask_ref, out_ref,
                *, n_shifts: int, wr: int, wa: int):
    """One grid step: 128 pairs; anchors [2*Wa, 128] (one plane set per
    orientation — identical in parity mode, CT/GA in 3N mode), reads
    [2*Wr, 128] (fwd stacked over rc)."""
    r_hi = r_hi_ref[...].astype(jnp.uint32)   # [2*Wr, 128] fwd then rc
    r_lo = r_lo_ref[...].astype(jnp.uint32)
    mask = mask_ref[...].astype(jnp.uint32)   # [Wr, 128]

    def per_shift(s, carry):
        word = s // 32
        bit = jnp.uint32(s % 32)
        up = jnp.minimum(jnp.uint32(32) - bit, jnp.uint32(31))
        for o in range(2):
            a_h = a_hi_ref[pl.ds(o * wa + word, wr + 1), :].astype(jnp.uint32)
            a_l = a_lo_ref[pl.ds(o * wa + word, wr + 1), :].astype(jnp.uint32)
            hi_part_h = jnp.where(bit == 0, jnp.uint32(0), a_h[1:wr + 1] << up)
            hi_part_l = jnp.where(bit == 0, jnp.uint32(0), a_l[1:wr + 1] << up)
            sa_hi = (a_h[0:wr] >> bit) | hi_part_h              # [wr, 128]
            sa_lo = (a_l[0:wr] >> bit) | hi_part_l
            mm = ((sa_hi ^ r_hi[o * wr:(o + 1) * wr])
                  | (sa_lo ^ r_lo[o * wr:(o + 1) * wr])) & mask
            ham = jnp.sum(
                jax.lax.population_count(mm).astype(jnp.int32), axis=0)
            out_ref[o, s, :] = ham
        return carry

    jax.lax.fori_loop(0, n_shifts, per_shift, 0)


_BIG32 = 0x3FFFFFFF


def pack_genome_planes(concat: jnp.ndarray, chunk: int = 1 << 24):
    """[G] int8 genome -> (hi, lo) uint-plane words [ceil(G/32)] int32.

    Bit j of word w is the hi/lo bit of base 32*w + j.  Packed once at build;
    the SHD anchor fetch then gathers aligned WORDS (32x fewer elements than
    the base-wise gather) and the sub-word offset folds into the kernel's
    shift range.  This is also the genome's 2-bit storage form (4x smaller
    than int8).
    """
    g = concat.shape[0]
    gw = (g + 31) // 32
    width = gw * 32
    padded = jnp.pad(concat, (0, width - g)).astype(jnp.int32)
    his = []
    los = []
    for s0 in range(0, width, chunk):
        part = jax.lax.dynamic_slice_in_dim(
            padded, s0, min(chunk, width - s0), 0)
        b = part.reshape(-1, 32)
        shifts = jnp.arange(32, dtype=jnp.int32)[None, :]
        his.append(jnp.sum(((b >> 1) & 1) << shifts, axis=1, dtype=jnp.int32))
        los.append(jnp.sum((b & 1) << shifts, axis=1, dtype=jnp.int32))
    return jnp.concatenate(his), jnp.concatenate(los)


def collapse_planes_ct(hi, lo):
    """C(01)->T(11) on bit planes: hi' = hi | lo."""
    return hi | lo, lo


def collapse_planes_ga(hi, lo):
    """G(10)->A(00) on bit planes: hi' = hi & lo."""
    return hi & lo, lo


def _shd_best_kernel(a_hi_ref, a_lo_ref, r_hi_ref, r_lo_ref, mask_ref,
                     max_shift_ref, out_ref, *, n_shifts: int, wr: int,
                     wa: int):
    """Running-argmin variant: no per-shift stores, static sub-word shifts.

    Outer fori over anchor word offsets (dynamic ref slices hoisted), inner
    python-unrolled bits 0..31 with constant shift amounts.  Tracks
    (best score, best shift) per orientation with strict-< updates, so ties
    keep the earliest shift — the reference kernel's rule.  Output block
    [4, 128]: rows = (best_f, shift_f, best_r, shift_r).
    """
    r_hi = r_hi_ref[...].astype(jnp.uint32)
    r_lo = r_lo_ref[...].astype(jnp.uint32)
    mask = mask_ref[...].astype(jnp.uint32)
    min_shift = max_shift_ref[0:1, :]                      # [1, 128] int32
    max_shift = max_shift_ref[1:2, :]
    n_words = (n_shifts + 31) // 32

    def per_word(word, carry):
        best_f, shift_f, best_r, shift_r = carry
        for o in range(2):
            a_h = a_hi_ref[pl.ds(o * wa + word, wr + 1), :].astype(jnp.uint32)
            a_l = a_lo_ref[pl.ds(o * wa + word, wr + 1), :].astype(jnp.uint32)
            rh = r_hi[o * wr:(o + 1) * wr]
            rl = r_lo[o * wr:(o + 1) * wr]
            for bit in range(32):
                if bit == 0:
                    sa_hi = a_h[0:wr]
                    sa_lo = a_l[0:wr]
                else:
                    sa_hi = (a_h[0:wr] >> bit) | (a_h[1:wr + 1] << (32 - bit))
                    sa_lo = (a_l[0:wr] >> bit) | (a_l[1:wr + 1] << (32 - bit))
                mm = ((sa_hi ^ rh) | (sa_lo ^ rl)) & mask
                ham = jnp.sum(jax.lax.population_count(mm).astype(jnp.int32),
                              axis=0, keepdims=True)       # [1, 128]
                s = word * 32 + bit
                ham = jnp.where((s >= min_shift) & (s <= max_shift), ham,
                                _BIG32)
                if o == 0:
                    upd = ham < best_f
                    best_f = jnp.where(upd, ham, best_f)
                    shift_f = jnp.where(upd, s, shift_f)
                else:
                    upd = ham < best_r
                    best_r = jnp.where(upd, ham, best_r)
                    shift_r = jnp.where(upd, s, shift_r)
        return best_f, shift_f, best_r, shift_r

    init = (jnp.full((1, LANES), _BIG32, dtype=jnp.int32),
            min_shift.astype(jnp.int32),
            jnp.full((1, LANES), _BIG32, dtype=jnp.int32),
            min_shift.astype(jnp.int32))
    best_f, shift_f, best_r, shift_r = jax.lax.fori_loop(
        0, n_words, per_word, init)
    out_ref[0, :] = best_f[0]
    out_ref[1, :] = shift_f[0]
    out_ref[2, :] = best_r[0]
    out_ref[3, :] = shift_r[0]


@partial(jax.jit, static_argnames=("n_shifts", "wa", "wr", "interpret"))
def shd_best(anchor_hi, anchor_lo, read_hi_both, read_lo_both, read_mask,
             shift_bounds, n_shifts: int, wa: int, wr: int,
             interpret: bool = False):
    """Best (score, shift) per orientation for P pairs (P multiple of 128).

    shift_bounds: [P, 2] int32 (min_shift, max_shift) inclusive — for the
    unpacked path (0, anchor_len - read_len); for the word-aligned packed
    path (bit0, bit0 + anchor_len - read_len).  Returns [P, 4] int32 rows
    (best_f, shift_f, best_r, shift_r); unreachable best = 0x3FFFFFFF.
    """
    p = anchor_hi.shape[0]
    assert p % LANES == 0
    assert anchor_hi.shape[1:] == (2, wa)
    tiles = p // LANES

    def spec(width):
        return pl.BlockSpec((width, LANES), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    a_hi = anchor_hi.reshape(p, 2 * wa).T
    a_lo = anchor_lo.reshape(p, 2 * wa).T
    r_hi = read_hi_both.reshape(p, 2 * wr).T
    r_lo = read_lo_both.reshape(p, 2 * wr).T
    m = read_mask.T
    ms = shift_bounds.T                                     # [2, P]

    out = pl.pallas_call(
        partial(_shd_best_kernel, n_shifts=n_shifts, wr=wr, wa=wa),
        grid=(tiles,),
        in_specs=[spec(2 * wa), spec(2 * wa), spec(2 * wr), spec(2 * wr),
                  spec(wr), spec(2)],
        out_specs=pl.BlockSpec((4, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, p), jnp.int32),
        interpret=interpret,
    )(a_hi, a_lo, r_hi, r_lo, m, ms)
    return out.T


@partial(jax.jit, static_argnames=("n_shifts", "wa", "wr", "interpret"))
def shd_hamming_matrix(anchor_hi, anchor_lo, read_hi_both, read_lo_both,
                       read_mask, n_shifts: int, wa: int, wr: int,
                       interpret: bool = False):
    """Full hamming matrix for P pairs (P multiple of 128).

    anchor planes: [P, 2, wa] int32, one plane set per orientation (wa padded
    so word+wr+1 stays in bounds); read planes: [P, 2, wr]; mask: [P, wr].
    Returns [P, 2, n_shifts] int32.
    """
    p = anchor_hi.shape[0]
    assert p % LANES == 0
    assert anchor_hi.shape[1:] == (2, wa)
    tiles = p // LANES

    def spec(width):
        return pl.BlockSpec((width, LANES), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    # transpose to [words, P] so pairs ride the lane axis
    a_hi = anchor_hi.reshape(p, 2 * wa).T
    a_lo = anchor_lo.reshape(p, 2 * wa).T
    r_hi = read_hi_both.reshape(p, 2 * wr).T
    r_lo = read_lo_both.reshape(p, 2 * wr).T
    m = read_mask.T

    out = pl.pallas_call(
        partial(_shd_kernel, n_shifts=n_shifts, wr=wr, wa=wa),
        grid=(tiles,),
        in_specs=[spec(2 * wa), spec(2 * wa), spec(2 * wr), spec(2 * wr),
                  spec(wr)],
        out_specs=pl.BlockSpec((2, n_shifts, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, n_shifts, p), jnp.int32),
        interpret=interpret,
    )(a_hi, a_lo, r_hi, r_lo, m)
    return out.transpose(2, 0, 1)
