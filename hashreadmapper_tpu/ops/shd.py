"""Shifted Hamming Distance against extended genome windows (device / JAX).

Re-derivation of the reference's SHD stage (reference:
src/gpu/hammingdistancekernels.cu:132-263 + window generation
include/gpu/windowgenerationkernels.cuh:17-48):

  * the anchor is the candidate genome window extended left/right by
    readLength/2 with the reference's quirk-compatible clamping (left
    extension is all-or-nothing: zero whenever extension >= window position);
  * the read is slid across every full-overlap shift in both orientations
    (forward first, then reverse-complement), hamming distance per shift;
  * strictly-smaller score wins, ties keep the earlier (orientation, shift);
  * orientation becomes None when best > trunc(readLen * maxHammingPercent)
    or when the read is longer than the anchor (score = readLen, shift = 0).

Instead of the reference's per-pair popcount loop with early exit, all shifts
are evaluated exactly — the result is the exact minimum, so early-exit
semantics are preserved by construction.  Implementations, slowest to
fastest, all bit-identical:
  * shd_pairs            — masked one-hot correlation scan (XLA reference)
  * shd_pairs_bitplane   — Pallas bit-plane popcount kernel (ops/shd_pallas)
  * shd_pairs_packed / shd_pairs_packed_planes — production path: word-
    aligned gathers from the pre-packed genome planes, per-read plane
    packing, sub-word offset folded into the kernel shift range; the
    three_n flag switches the per-orientation CT/GA collapsed spaces.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Orientation codes (reference: include/alignmentorientation.hpp:4)
FORWARD = 1
REVERSE_COMPLEMENT = 2
NONE = 3

_BIG = np.int32(0x3FFFFFFF)  # np, not jnp: a module-level jnp
# constant initializes the device backend at import time, wedging the
# platform choice (dryrun_multichip must pick CPU before first init)


class ExtendedWindows(NamedTuple):
    start: jnp.ndarray    # [P] int32 chromosome-local start of extended window
    left: jnp.ndarray     # [P] int32 applied left extension
    length: jnp.ndarray   # [P] int32 extended-window length


def extended_window_location(pos: jnp.ndarray, chrom_len: jnp.ndarray,
                             read_len: jnp.ndarray, window_size: int
                             ) -> ExtendedWindows:
    """Vectorized computeWindowLocation (windowgenerationkernels.cuh:17-48)."""
    ext = read_len // 2
    left = jnp.where(ext < pos, ext, 0)
    end = pos + window_size
    in_bounds = end <= chrom_len
    right = jnp.where(
        in_bounds,
        jnp.where(end + ext < chrom_len, ext, chrom_len - end),
        0)
    length = window_size + left + right - jnp.where(in_bounds, 0, end - chrom_len)
    return ExtendedWindows(start=pos - left, left=left, length=length)


class ShdParams(NamedTuple):
    window_size: int
    max_ext_len: int       # static bound: window_size + max_read_len
    max_read_len: int
    max_hamming_percent: float


class ShdResult(NamedTuple):
    hamming: jnp.ndarray      # [P] int32 best score
    shift: jnp.ndarray        # [P] int32 shift in ORIGINAL window coordinates
    orientation: jnp.ndarray  # [P] int8 FORWARD / REVERSE_COMPLEMENT / NONE


def _onehot(bases: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """[..., L] int -> [..., L, 4] bf16 one-hot, zeros where masked out."""
    oh = jax.nn.one_hot(bases, 4, dtype=jnp.bfloat16)
    return oh * mask[..., None].astype(jnp.bfloat16)


@partial(jax.jit, static_argnames=("params",))
def shd_pairs(genome_concat: jnp.ndarray,
              anchor_global_start: jnp.ndarray,
              anchor_length: jnp.ndarray,
              anchor_left: jnp.ndarray,
              read_bases: jnp.ndarray,
              read_len: jnp.ndarray,
              pair_valid: jnp.ndarray,
              params: ShdParams) -> ShdResult:
    """SHD for P (extended-window, read) pairs.

    Args:
      genome_concat: [G] int8 whole-genome base codes (chromosomes
        concatenated; windows never cross chromosome bounds by construction).
      anchor_global_start: [P] int32 start of each extended window in
        genome_concat (chromosome offset already applied).
      anchor_length / anchor_left: from extended_window_location.
      read_bases: [P, Lr] int8; read_len: [P] int32; pair_valid: [P] bool.
    """
    p, lr = read_bases.shape
    assert lr == params.max_read_len
    s_max = params.max_ext_len - 1 + 1  # shifts 0 .. max_ext_len-1 (masked)
    pad_len = params.max_ext_len + lr

    pos_iota = jnp.arange(pad_len, dtype=jnp.int32)[None, :]
    gather_idx = jnp.clip(
        anchor_global_start[:, None] + pos_iota, 0, genome_concat.shape[0] - 1)
    anchor = jnp.take(genome_concat, gather_idx)                  # [P, pad]
    anchor_mask = pos_iota < anchor_length[:, None]
    anchor_oh = _onehot(anchor, anchor_mask)                      # [P, pad, 4]

    read_iota = jnp.arange(lr, dtype=jnp.int32)[None, :]
    read_mask = read_iota < read_len[:, None]
    read_oh = _onehot(read_bases, read_mask)                      # [P, Lr, 4]
    # reverse complement: rc[i] = 3 - read[len-1-i]
    src = jnp.clip(read_len[:, None] - 1 - read_iota, 0, lr - 1)
    rc_bases = 3 - jnp.take_along_axis(read_bases.astype(jnp.int32), src, axis=1)
    rc_oh = _onehot(rc_bases, read_mask)

    both_oh = jnp.stack([read_oh, rc_oh], axis=1)                 # [P, 2, Lr, 4]

    def body(_, s):
        window = jax.lax.dynamic_slice_in_dim(anchor_oh, s, lr, axis=1)
        m = jnp.einsum("pla,pola->po", window, both_oh,
                       preferred_element_type=jnp.float32)        # [P, 2]
        return None, m

    _, matches = jax.lax.scan(body, None,
                              jnp.arange(s_max, dtype=jnp.int32))  # [S, P, 2]
    matches = matches.transpose(1, 2, 0)                          # [P, 2, S]
    hamming = read_len[:, None, None] - matches.astype(jnp.int32)
    return finalize_shd(hamming, anchor_length, anchor_left, read_len,
                        pair_valid, params)


def finalize_shd(hamming: jnp.ndarray, anchor_length: jnp.ndarray,
                 anchor_left: jnp.ndarray, read_len: jnp.ndarray,
                 pair_valid: jnp.ndarray, params: ShdParams) -> ShdResult:
    """Shared argmin/threshold post-processing over a [P, 2, S] matrix.

    Tie rules mirror the reference kernel's iteration order (forward before
    RC, shifts ascending, strictly-smaller score wins)."""
    p, _, s_max = hamming.shape
    shift_iota = jnp.arange(s_max, dtype=jnp.int32)[None, None, :]
    shift_ok = shift_iota <= (anchor_length - read_len)[:, None, None]
    hamming = jnp.where(shift_ok, hamming, _BIG)

    flat = hamming.reshape(p, 2 * s_max)
    best_idx = jnp.argmin(flat, axis=1)          # first occurrence of the min
    best = jnp.take_along_axis(flat, best_idx[:, None], axis=1)[:, 0]
    best_orient = (best_idx // s_max).astype(jnp.int32)
    best_shift = (best_idx % s_max).astype(jnp.int32)

    too_long = read_len > anchor_length
    threshold = (read_len.astype(jnp.float32)
                 * jnp.float32(params.max_hamming_percent)).astype(jnp.int32)
    good = (best <= threshold) & ~too_long & pair_valid

    orientation = jnp.where(
        good,
        jnp.where(best_orient == 0, FORWARD, REVERSE_COMPLEMENT),
        NONE).astype(jnp.int8)
    score = jnp.where(too_long, read_len, best)
    shift_out = jnp.where(too_long, 0, best_shift) - jnp.where(
        too_long, 0, anchor_left)
    return ShdResult(hamming=score.astype(jnp.int32),
                     shift=shift_out.astype(jnp.int32),
                     orientation=orientation)


@partial(jax.jit, static_argnames=("params",))
def shd_pairs_bitplane(genome_concat: jnp.ndarray,
                       anchor_global_start: jnp.ndarray,
                       anchor_length: jnp.ndarray,
                       anchor_left: jnp.ndarray,
                       read_bases: jnp.ndarray,
                       read_len: jnp.ndarray,
                       pair_valid: jnp.ndarray,
                       params: ShdParams) -> ShdResult:
    """SHD via the Pallas bit-plane popcount kernel (ops/shd_pallas.py).

    Bit-identical to shd_pairs: the hamming matrix is exact and the shared
    finalize_shd applies the same tie rules."""
    from . import shd_pallas

    p, lr = read_bases.shape
    assert lr == params.max_read_len
    s_max = params.max_ext_len
    wr = (lr + 31) // 32
    wa_pad = (s_max - 1) // 32 + wr + 2

    pos_iota = jnp.arange(wa_pad * 32, dtype=jnp.int32)[None, :]
    gather_idx = jnp.clip(
        anchor_global_start[:, None] + pos_iota, 0, genome_concat.shape[0] - 1)
    anchor = jnp.take(genome_concat, gather_idx)                  # [P, 32*wa]
    anchor_mask_len = jnp.minimum(anchor_length, wa_pad * 32)
    a_hi, a_lo, _ = shd_pallas.pack_bitplanes(anchor, anchor_mask_len, wa_pad)

    read_iota = jnp.arange(lr, dtype=jnp.int32)[None, :]
    src = jnp.clip(read_len[:, None] - 1 - read_iota, 0, lr - 1)
    rc_bases = (3 - jnp.take_along_axis(
        read_bases.astype(jnp.int32), src, axis=1)).astype(jnp.int8)
    r_hi_f, r_lo_f, mask = shd_pallas.pack_bitplanes(read_bases, read_len, wr)
    r_hi_r, r_lo_r, _ = shd_pallas.pack_bitplanes(rc_bases, read_len, wr)

    best4 = _run_bitplane_kernel(
        p, a_hi, a_lo, a_hi, a_lo, r_hi_f, r_lo_f, r_hi_r, r_lo_r, mask,
        s_max, wa_pad, wr, anchor_length - read_len)
    return finalize_shd_from_best(best4, anchor_length, anchor_left,
                                  read_len, pair_valid, params)


def _run_bitplane_kernel(p, a_hi_fwd, a_lo_fwd, a_hi_rc, a_lo_rc,
                         r_hi_f, r_lo_f, r_hi_r, r_lo_r, mask,
                         s_max, wa_pad, wr, max_shift):
    """Runs the running-argmin Pallas kernel; returns [P, 4] int32
    (best_f, shift_f, best_r, shift_r)."""
    from . import shd_pallas

    pad = (-p) % shd_pallas.LANES
    if pad:
        padder = lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        a_hi_fwd, a_lo_fwd = padder(a_hi_fwd), padder(a_lo_fwd)
        a_hi_rc, a_lo_rc = padder(a_hi_rc), padder(a_lo_rc)
        r_hi_f, r_lo_f = padder(r_hi_f), padder(r_lo_f)
        r_hi_r, r_lo_r, mask = padder(r_hi_r), padder(r_lo_r), padder(mask)
        max_shift = jnp.pad(max_shift, (0, pad), constant_values=-1)

    a_hi = jnp.stack([a_hi_fwd, a_hi_rc], axis=1)   # [P, 2, wa]
    a_lo = jnp.stack([a_lo_fwd, a_lo_rc], axis=1)
    r_hi = jnp.stack([r_hi_f, r_hi_r], axis=1)
    r_lo = jnp.stack([r_lo_f, r_lo_r], axis=1)
    bounds = jnp.stack([jnp.zeros_like(max_shift), max_shift], axis=1)
    interpret = jax.default_backend() != "tpu"
    best = shd_pallas.shd_best(
        a_hi, a_lo, r_hi, r_lo, mask, bounds, s_max, wa_pad, wr,
        interpret=interpret)[:p]
    return best


def finalize_shd_from_best(best4: jnp.ndarray, anchor_length: jnp.ndarray,
                           anchor_left: jnp.ndarray, read_len: jnp.ndarray,
                           pair_valid: jnp.ndarray,
                           params: ShdParams) -> ShdResult:
    """Post-processing from per-orientation running-argmin kernel output.

    Equivalent to finalize_shd over the full matrix: forward wins orientation
    ties (strict < selects RC), the kernel already kept the earliest shift.
    """
    best_f, shift_f, best_r, shift_r = (best4[:, 0], best4[:, 1],
                                        best4[:, 2], best4[:, 3])
    use_rc = best_r < best_f
    best = jnp.where(use_rc, best_r, best_f)
    best_shift = jnp.where(use_rc, shift_r, shift_f)

    too_long = read_len > anchor_length
    threshold = (read_len.astype(jnp.float32)
                 * jnp.float32(params.max_hamming_percent)).astype(jnp.int32)
    good = (best <= threshold) & ~too_long & pair_valid
    orientation = jnp.where(
        good, jnp.where(use_rc, REVERSE_COMPLEMENT, FORWARD),
        NONE).astype(jnp.int8)
    score = jnp.where(too_long, read_len, best)
    shift_out = jnp.where(too_long, 0, best_shift) - jnp.where(
        too_long, 0, anchor_left)
    return ShdResult(hamming=score.astype(jnp.int32),
                     shift=shift_out.astype(jnp.int32),
                     orientation=orientation)


@partial(jax.jit, static_argnames=("params",))
def shd_pairs_bitplane_3n(genome_concat: jnp.ndarray,
                          anchor_global_start: jnp.ndarray,
                          anchor_length: jnp.ndarray,
                          anchor_left: jnp.ndarray,
                          read_bases: jnp.ndarray,
                          read_len: jnp.ndarray,
                          pair_valid: jnp.ndarray,
                          params: ShdParams) -> ShdResult:
    """Bisulfite-aware SHD: per-orientation collapsed comparison spaces.

    Forward orientation compares CT(read) against CT(anchor); the RC
    orientation compares GA(RC(read)) against GA(anchor) (equal to
    RC(CT-collapse of the reverse strand)).  This realizes the conversion
    the reference left commented out in its kernel
    (hammingdistancekernels.cu:204) — symmetrically for both strands.
    """
    p, lr = read_bases.shape
    assert lr == params.max_read_len
    s_max = params.max_ext_len
    wr = (lr + 31) // 32
    wa_pad = (s_max - 1) // 32 + wr + 2

    pos_iota = jnp.arange(wa_pad * 32, dtype=jnp.int32)[None, :]
    gather_idx = jnp.clip(
        anchor_global_start[:, None] + pos_iota, 0, genome_concat.shape[0] - 1)
    anchor = jnp.take(genome_concat, gather_idx)
    anchor_ct = jnp.where(anchor == 1, jnp.int8(3), anchor)
    anchor_ga = jnp.where(anchor == 2, jnp.int8(0), anchor)
    anchor_mask_len = jnp.minimum(anchor_length, wa_pad * 32)
    from . import shd_pallas
    act_hi, act_lo, _ = shd_pallas.pack_bitplanes(
        anchor_ct, anchor_mask_len, wa_pad)
    aga_hi, aga_lo, _ = shd_pallas.pack_bitplanes(
        anchor_ga, anchor_mask_len, wa_pad)

    read_iota = jnp.arange(lr, dtype=jnp.int32)[None, :]
    src = jnp.clip(read_len[:, None] - 1 - read_iota, 0, lr - 1)
    rc_bases = (3 - jnp.take_along_axis(
        read_bases.astype(jnp.int32), src, axis=1)).astype(jnp.int8)
    read_ct = jnp.where(read_bases == 1, jnp.int8(3), read_bases)
    rc_ga = jnp.where(rc_bases == 2, jnp.int8(0), rc_bases)
    r_hi_f, r_lo_f, mask = shd_pallas.pack_bitplanes(read_ct, read_len, wr)
    r_hi_r, r_lo_r, _ = shd_pallas.pack_bitplanes(rc_ga, read_len, wr)

    best4 = _run_bitplane_kernel(
        p, act_hi, act_lo, aga_hi, aga_lo, r_hi_f, r_lo_f, r_hi_r, r_lo_r,
        mask, s_max, wa_pad, wr, anchor_length - read_len)
    return finalize_shd_from_best(best4, anchor_length, anchor_left,
                                  read_len, pair_valid, params)


def pack_read_planes(read_bases: jnp.ndarray, read_len: jnp.ndarray,
                     three_n: bool, undirectional: bool = False):
    """Per-READ plane packing for the packed SHD: returns
    (hi_o0, lo_o0, hi_o1, lo_o1, mask) each [N, wr].  Orientation 0 is the
    read (CT-collapsed in 3N mode); orientation 1 is its reverse complement
    (GA-collapsed in 3N mode).  With undirectional=True the collapses are
    MIRRORED — orientation 0 GA-collapsed, orientation 1 CT-collapsed —
    for the PBAT strands (a G->A-in-read-space read matches the window's
    GA space forward, and its RC matches the CT space).  Pack once per
    read, then gather rows per pair — kcap x cheaper than packing per
    pair."""
    from . import shd_pallas

    n, lr = read_bases.shape
    wr = (lr + 31) // 32
    read_iota = jnp.arange(lr, dtype=jnp.int32)[None, :]
    src = jnp.clip(read_len[:, None] - 1 - read_iota, 0, lr - 1)
    rc_bases = (3 - jnp.take_along_axis(
        read_bases.astype(jnp.int32), src, axis=1)).astype(jnp.int8)
    if three_n and undirectional:
        o0 = jnp.where(read_bases == 2, jnp.int8(0), read_bases)
        o1 = jnp.where(rc_bases == 1, jnp.int8(3), rc_bases)
    elif three_n:
        o0 = jnp.where(read_bases == 1, jnp.int8(3), read_bases)
        o1 = jnp.where(rc_bases == 2, jnp.int8(0), rc_bases)
    else:
        o0 = read_bases
        o1 = rc_bases
    hi0, lo0, mask = shd_pallas.pack_bitplanes(o0, read_len, wr)
    hi1, lo1, _ = shd_pallas.pack_bitplanes(o1, read_len, wr)
    return hi0, lo0, hi1, lo1, mask


@partial(jax.jit, static_argnames=("params", "three_n", "undirectional"))
def shd_pairs_packed_planes(genome_hi, genome_lo,
                            anchor_global_start, anchor_length, anchor_left,
                            r_hi_f, r_lo_f, r_hi_r, r_lo_r, mask,
                            read_len, pair_valid, params: ShdParams,
                            three_n: bool = False,
                            undirectional: bool = False) -> ShdResult:
    """Packed SHD over pairs whose read planes are already packed/gathered.

    undirectional=True mirrors the window collapses (orientation 0 GA,
    orientation 1 CT) to match pack_read_planes(undirectional=True)."""
    from . import shd_pallas

    p, wr = r_hi_f.shape
    s_max = params.window_size + 32
    wa_pad = (s_max - 1) // 32 + wr + 2

    word0 = jnp.maximum(anchor_global_start, 0) >> 5
    bit0 = (anchor_global_start & 31).astype(jnp.int32)
    nwords_genome = genome_hi.shape[0]
    widx = jnp.clip(
        word0[:, None] + jnp.arange(wa_pad, dtype=jnp.int32)[None, :],
        0, nwords_genome - 1)
    a_hi = jnp.take(genome_hi, widx)                       # [P, wa_pad]
    a_lo = jnp.take(genome_lo, widx)
    if three_n and undirectional:
        f_hi, f_lo = shd_pallas.collapse_planes_ga(a_hi, a_lo)
        r2_hi, r2_lo = shd_pallas.collapse_planes_ct(a_hi, a_lo)
    elif three_n:
        f_hi, f_lo = shd_pallas.collapse_planes_ct(a_hi, a_lo)
        r2_hi, r2_lo = shd_pallas.collapse_planes_ga(a_hi, a_lo)
    else:
        f_hi, f_lo = a_hi, a_lo
        r2_hi, r2_lo = a_hi, a_lo

    max_shift = bit0 + (anchor_length - read_len)
    bounds = jnp.stack([bit0, max_shift], axis=1)

    pad = (-p) % shd_pallas.LANES
    if pad:
        padder = lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        f_hi, f_lo, r2_hi, r2_lo = map(padder, (f_hi, f_lo, r2_hi, r2_lo))
        r_hi_f, r_lo_f = padder(r_hi_f), padder(r_lo_f)
        r_hi_r, r_lo_r, mask = padder(r_hi_r), padder(r_lo_r), padder(mask)
        bounds = jnp.pad(bounds, ((0, pad), (0, 0)), constant_values=-1)

    a_hi2 = jnp.stack([f_hi, r2_hi], axis=1)
    a_lo2 = jnp.stack([f_lo, r2_lo], axis=1)
    r_hi = jnp.stack([r_hi_f, r_hi_r], axis=1)
    r_lo = jnp.stack([r_lo_f, r_lo_r], axis=1)
    interpret = jax.default_backend() != "tpu"
    best4 = shd_pallas.shd_best(
        a_hi2, a_lo2, r_hi, r_lo, mask, bounds, s_max, wa_pad, wr,
        interpret=interpret)[:p]
    best4 = best4.at[:, 1].add(-bit0)
    best4 = best4.at[:, 3].add(-bit0)
    return finalize_shd_from_best(best4, anchor_length, anchor_left,
                                  read_len, pair_valid, params)


@partial(jax.jit, static_argnames=("params", "three_n"))
def shd_pairs_packed(genome_hi: jnp.ndarray, genome_lo: jnp.ndarray,
                     genome_len: jnp.ndarray,
                     anchor_global_start: jnp.ndarray,
                     anchor_length: jnp.ndarray,
                     anchor_left: jnp.ndarray,
                     read_bases: jnp.ndarray,
                     read_len: jnp.ndarray,
                     pair_valid: jnp.ndarray,
                     params: ShdParams,
                     three_n: bool = False) -> ShdResult:
    """SHD against a pre-packed bit-plane genome (word-aligned gathers).

    The genome lives as hi/lo plane words (shd_pallas.pack_genome_planes),
    so the anchor fetch gathers ~wa consecutive int32 WORDS per pair instead
    of ~32*wa scalar bases, and the sub-word offset bit0 = start % 32 folds
    into the kernel's shift range (reported shifts are shifted back).
    three_n=True compares orientation 0 in C->T space and orientation 1 in
    G->A space via the one-op plane collapses (collapse_planes_ct/ga).
    Results are bit-identical to shd_pairs_bitplane / _3n.
    """
    from . import shd_pallas

    p, lr = read_bases.shape
    assert lr == params.max_read_len
    # max valid shift = bit0 + (anchor_len - read_len) <= 31 + window_size
    # (anchor_len <= window_size + 2*(read_len//2) <= window_size + read_len)
    s_max = params.window_size + 32
    wr = (lr + 31) // 32
    wa_pad = (s_max - 1) // 32 + wr + 2

    word0 = anchor_global_start >> 5
    bit0 = (anchor_global_start & 31).astype(jnp.int32)
    nwords_genome = genome_hi.shape[0]
    widx = jnp.clip(word0[:, None] + jnp.arange(wa_pad, dtype=jnp.int32)[None, :],
                    0, nwords_genome - 1)
    a_hi = jnp.take(genome_hi, widx)                       # [P, wa_pad]
    a_lo = jnp.take(genome_lo, widx)

    if three_n:
        f_hi, f_lo = shd_pallas.collapse_planes_ct(a_hi, a_lo)
        r2_hi, r2_lo = shd_pallas.collapse_planes_ga(a_hi, a_lo)
    else:
        f_hi, f_lo = a_hi, a_lo
        r2_hi, r2_lo = a_hi, a_lo

    read_iota = jnp.arange(lr, dtype=jnp.int32)[None, :]
    src = jnp.clip(read_len[:, None] - 1 - read_iota, 0, lr - 1)
    rc_bases = (3 - jnp.take_along_axis(
        read_bases.astype(jnp.int32), src, axis=1)).astype(jnp.int8)
    if three_n:
        read_o0 = jnp.where(read_bases == 1, jnp.int8(3), read_bases)
        read_o1 = jnp.where(rc_bases == 2, jnp.int8(0), rc_bases)
    else:
        read_o0 = read_bases
        read_o1 = rc_bases
    r_hi_f, r_lo_f, mask = shd_pallas.pack_bitplanes(read_o0, read_len, wr)
    r_hi_r, r_lo_r, _ = shd_pallas.pack_bitplanes(read_o1, read_len, wr)

    max_shift = bit0 + (anchor_length - read_len)
    bounds = jnp.stack([bit0, max_shift], axis=1)

    pad = (-p) % shd_pallas.LANES
    if pad:
        padder = lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        f_hi, f_lo, r2_hi, r2_lo = map(padder, (f_hi, f_lo, r2_hi, r2_lo))
        r_hi_f, r_lo_f = padder(r_hi_f), padder(r_lo_f)
        r_hi_r, r_lo_r, mask = padder(r_hi_r), padder(r_lo_r), padder(mask)
        bounds = jnp.pad(bounds, ((0, pad), (0, 0)),
                         constant_values=-1)

    a_hi2 = jnp.stack([f_hi, r2_hi], axis=1)
    a_lo2 = jnp.stack([f_lo, r2_lo], axis=1)
    r_hi = jnp.stack([r_hi_f, r_hi_r], axis=1)
    r_lo = jnp.stack([r_lo_f, r_lo_r], axis=1)
    interpret = jax.default_backend() != "tpu"
    best4 = shd_pallas.shd_best(
        a_hi2, a_lo2, r_hi, r_lo, mask, bounds, s_max, wa_pad, wr,
        interpret=interpret)[:p]
    # shifts were computed relative to the aligned word start
    best4 = best4.at[:, 1].add(-bit0)
    best4 = best4.at[:, 3].add(-bit0)
    return finalize_shd_from_best(best4, anchor_length, anchor_left,
                                  read_len, pair_valid, params)
