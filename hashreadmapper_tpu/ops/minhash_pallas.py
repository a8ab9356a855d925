"""Pallas TPU kernel: fused murmur64 minhash signature reduction.

TPU-native re-design of minhashSignatures3264Kernel (reference:
include/gpu/gpusequencehasher.cuh:114-169 with the MurmurHash<u64> finalizer
from include/hpc_helpers/include/hashers.cuh:128-137).  The XLA formulation
(ops/minhash.py) materializes the [N, F, P] murmur intermediate chains in
HBM; an honest (D2H-forced) stage budget showed it at ~26 ms of the 28 ms
coarse batch — 90% of STEP 1.  Here the whole reduction

    sig[n, f] = min over positions p of murmur64(kmer[n, p] + f)

runs in ONE kernel: positions ride the sublane axis, sequences ride the
128-wide lanes, the F hash functions are an unrolled in-register loop, and
only the [F, N] signature minima leave VMEM.

Only k <= 16 is supported (the production configuration; k=16 kmers are
exactly 32 bits, so the kmer's high word is always zero and the murmur
input high word is just the carry of kmer + hash_id).  The 64-bit
arithmetic uses the same (hi, lo) uint32-pair formulation as ops/u64.py;
unsigned comparisons go through the sign-flip trick (uint order == int
order after XOR 0x80000000) because Mosaic's integer compares are signed.

Bit-identical to ops/minhash.py::minhash_signatures (the XLA path) —
tests/test_minhash_pallas.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_FLIP = 0x80000000
_C1_HI, _C1_LO = 0xFF51AFD7, 0xED558CCD   # murmur fmix64 constants
_C2_HI, _C2_LO = 0xC4CEB9FE, 0x1A85EC53   # (hashers.cuh:128-137)


def _umul32_wide(a, b):
    """Full 32x32 -> 64 bit product on uint32 lanes (ops/u64.py)."""
    al = a & jnp.uint32(0xFFFF)
    ah = a >> 16
    bl = b & jnp.uint32(0xFFFF)
    bh = b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid = lh + hl
    mid_carry = (_ltu(mid, lh)).astype(jnp.uint32) << 16
    lo = ll + (mid << 16)
    lo_carry = (_ltu(lo, ll)).astype(jnp.uint32)
    hi = hh + (mid >> 16) + mid_carry + lo_carry
    return hi, lo


def _ltu(a, b):
    """Unsigned a < b via the sign-flip trick (Mosaic compares are signed)."""
    f = jnp.uint32(_FLIP)
    return (jax.lax.bitcast_convert_type(a ^ f, jnp.int32)
            < jax.lax.bitcast_convert_type(b ^ f, jnp.int32))


def _mul_const(hi, lo, chi, clo):
    """(hi, lo) * (chi, clo) mod 2**64 with static constants."""
    chi = jnp.uint32(chi)
    clo = jnp.uint32(clo)
    phi, plo = _umul32_wide(lo, clo)
    phi = phi + lo * chi + hi * clo
    return phi, plo


def _murmur64(hi, lo):
    """MurmurHash3 fmix64 on (hi, lo) uint32 pairs (u64.murmur64)."""
    # x ^= x >> 33
    lo = lo ^ (hi >> 1)
    # (hi unchanged by >>33 xor into hi: (x>>33).hi == 0)
    hi, lo = _mul_const(hi, lo, _C1_HI, _C1_LO)
    lo = lo ^ (hi >> 1)
    hi, lo = _mul_const(hi, lo, _C2_HI, _C2_LO)
    lo = lo ^ (hi >> 1)
    return hi, lo


def _shift_up(x, i, fill):
    """Sublane shift: out[p] = x[p+i] (tail filled)."""
    if i == 0:
        return x
    return jnp.concatenate(
        [x[i:], jnp.full((i,) + x.shape[1:], fill, x.dtype)], axis=0)


def _masked_min_sig(hhi, hlo, valid, big, fl):
    """Masked lexicographic u64 min over sublanes -> flipped-int32 low."""
    fhi = jax.lax.bitcast_convert_type(hhi ^ fl, jnp.int32)
    flo = jax.lax.bitcast_convert_type(hlo ^ fl, jnp.int32)
    hi_m = jnp.where(valid, fhi, big)
    min_hi = jnp.min(hi_m, axis=0, keepdims=True)
    lo_m = jnp.where(valid & (hi_m == min_hi), flo, big)
    return jnp.min(lo_m, axis=0)


def _bases_sig_kernel(hid_ref, bases_ref, len_ref, out_ref, *, k: int,
                      f: int, mode: str):
    """One block: bases [L_pad, BN] int8 codes 0..3 (sequences on lanes,
    positions on sublanes, already 3N-collapsed by the caller), lengths
    [1, BN].  Builds the forward and reverse-complement k-mers with k
    sublane shifts (the XLA formulation's unaligned lane slices were ~90%
    of the coarse step), then the murmur min per hash id.

    mode: 'fwd'  -> out [F, BN]  min over forward k-mers
          'both' -> out [2F, BN] rows 0..F-1 forward, F..2F-1 revcomp
                    (the 3N read pair: sig_GA-space == min over the RC
                    k-mers of the CT-collapsed read, since
                    GA(RC(x)) == RC(CT(x)) and k-mer sets of RC are the
                    revcomp k-mers)
          'canon'-> out [F, BN]  min over canonical k-mers
                    (min(fwd, rc); sequencehelpers.hpp:847-935)
    """
    b = bases_ref[...].astype(jnp.uint32)       # [L_pad, BN]
    fwd = jnp.zeros_like(b)
    rcv = jnp.zeros_like(b) if mode in ("both", "canon") else None
    for i in range(k):
        bi = _shift_up(b, i, jnp.uint32(0))
        fwd = fwd | (bi << (2 * (k - 1 - i)))
        if rcv is not None:
            rcv = rcv | ((jnp.uint32(3) - bi) << (2 * i))
    pos = jax.lax.broadcasted_iota(jnp.int32, b.shape, 0)
    valid = pos <= (len_ref[...] - k)
    big = jnp.int32(0x7FFFFFFF)
    fl = jnp.uint32(_FLIP)
    if mode == "canon":
        take_r = _ltu(rcv, fwd)
        fwd = jnp.where(take_r, rcv, fwd)
        rcv = None
    for fi in range(f):
        fv = hid_ref[0, fi].astype(jnp.uint32)
        lo_f = fwd + fv
        hi_f = _ltu(lo_f, fwd).astype(jnp.uint32)
        hhi, hlo = _murmur64(hi_f, lo_f)
        out_ref[fi, :] = _masked_min_sig(hhi, hlo, valid, big, fl)
        if mode == "both":
            lo_r = rcv + fv
            hi_r = _ltu(lo_r, rcv).astype(jnp.uint32)
            rhi, rlo = _murmur64(hi_r, lo_r)
            out_ref[f + fi, :] = _masked_min_sig(rhi, rlo, valid, big, fl)


@partial(jax.jit, static_argnames=("k", "mode", "interpret"))
def sigs_from_bases(bases: jnp.ndarray, lengths: jnp.ndarray, k: int,
                    hash_ids: jnp.ndarray, mode: str = "fwd",
                    interpret: bool = False) -> jnp.ndarray:
    """Fused k-mer build + murmur minhash from (collapsed) base codes.

    bases: [N, L] int8 codes 0..3; lengths [N]; hash_ids [F] uint32.
    Returns [N, F] ('fwd'/'canon') or [N, 2F] ('both') uint32 minima
    (0xFFFFFFFF where no valid position).  Bit-identical to the XLA
    formulation in ops/minhash.py (tests/test_minhash_pallas.py).
    """
    n, maxlen = bases.shape
    f = int(hash_ids.shape[0])
    assert n % LANES == 0 and 1 <= k <= 16
    l_pad = -(-maxlen // 32) * 32              # int8 sublane tile = 32
    bt = jnp.zeros((l_pad, n), jnp.int8)
    bt = bt.at[:maxlen].set(bases.T)
    lens = jnp.minimum(lengths.astype(jnp.int32), maxlen)
    rows = 2 * f if mode == "both" else f
    out = pl.pallas_call(
        partial(_bases_sig_kernel, k=k, f=f, mode=mode),
        grid=(n // LANES,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((l_pad, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.int32),
        interpret=interpret,
    )(hash_ids.astype(jnp.int32).reshape(1, f), bt, lens.reshape(1, n))
    sig = jax.lax.bitcast_convert_type(out, jnp.uint32) ^ jnp.uint32(_FLIP)
    return sig.T


def _sig_kernel(hid_ref, kmer_ref, len_ref, out_ref, *, k: int, f: int):
    """One block: kmers [P_pad, BN] (positions x sequences), lengths
    [1, BN]; writes out [F, BN] flipped-int32 signature lows."""
    lo0 = jax.lax.bitcast_convert_type(kmer_ref[...], jnp.uint32)
    pos = jax.lax.broadcasted_iota(jnp.int32, lo0.shape, 0)
    valid = pos <= (len_ref[...] - k)
    big = jnp.int32(0x7FFFFFFF)                 # flipped 0xFFFFFFFF
    fl = jnp.uint32(_FLIP)
    for fi in range(f):
        fv = hid_ref[0, fi]
        lo_f = lo0 + fv.astype(jnp.uint32)
        hi_f = _ltu(lo_f, lo0).astype(jnp.uint32)   # carry (kmer hi == 0)
        hhi, hlo = _murmur64(hi_f, lo_f)
        # masked lexicographic min over positions (sublanes), flipped ints
        fhi = jax.lax.bitcast_convert_type(hhi ^ fl, jnp.int32)
        flo = jax.lax.bitcast_convert_type(hlo ^ fl, jnp.int32)
        hi_m = jnp.where(valid, fhi, big)
        min_hi = jnp.min(hi_m, axis=0, keepdims=True)
        lo_m = jnp.where(valid & (hi_m == min_hi), flo, big)
        out_ref[fi, :] = jnp.min(lo_m, axis=0)


def can_use(k: int, n: int, npos: int) -> bool:
    """The kernel covers the production shapes; anything else falls back
    to the XLA formulation (bit-identical)."""
    return (jax.default_backend() == "tpu" and 1 <= k <= 16
            and n % LANES == 0 and n > 0 and npos >= 1)


@partial(jax.jit, static_argnames=("k", "interpret"))
def sig_min_murmur(kmer_lo: jnp.ndarray, lengths: jnp.ndarray, k: int,
                   hash_ids: jnp.ndarray, interpret: bool = False
                   ) -> jnp.ndarray:
    """sig[n, f] = min_p murmur64(kmer_lo[n, p] + hash_ids[f]) & mask.

    kmer_lo: [N, P] uint32 (k <= 16: the kmer's high word is zero);
    lengths: [N] int32 (position p valid iff p <= length - k);
    hash_ids: [F] uint32.  Returns [N, F] uint32 minima (0xFFFFFFFF where
    a row has no valid position), exactly ops/minhash.py's masked min.
    """
    n, npos = kmer_lo.shape
    f = int(hash_ids.shape[0])
    assert n % LANES == 0
    p_pad = -(-npos // 8) * 8
    kt = jnp.zeros((p_pad, n), jnp.int32)
    kt = kt.at[:npos].set(
        jax.lax.bitcast_convert_type(kmer_lo, jnp.int32).T)
    # rows >= npos read as positions > length-k via the iota test as long
    # as length <= npos + k - 1, which stage_reads guarantees (lengths are
    # <= the padded base width); clamp defensively anyway
    lens = jnp.minimum(lengths.astype(jnp.int32), npos + k - 1)
    out = pl.pallas_call(
        partial(_sig_kernel, k=k, f=f),
        grid=(n // LANES,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((p_pad, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((f, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f, n), jnp.int32),
        interpret=interpret,
    )(hash_ids.astype(jnp.int32).reshape(1, f), kt,
      lens.reshape(1, n))
    sig = jax.lax.bitcast_convert_type(out, jnp.uint32) ^ jnp.uint32(_FLIP)
    return sig.T
