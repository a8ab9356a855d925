"""Batched on-device banded affine-gap traceback (STEP-2 CIGAR DP).

Device reformulation of the banded CIGAR pass that follows the SSW score
passes (reference: src/ssw.c:550-790 banded_sw driven from
src/gpu/mappinghandler.cu:560-595; host oracle align/sw.py::_banded_cigar,
golden-verified, re-derived natively in native/swalign.cpp::banded_cigar).
This was the last remaining host DP: ~50% of pairs are not covered by the
all-M diag certificate (ops/swdev.py::_diag_fastpath_flag) and paid ~18
ns/cell on the host.  Here the band fill runs as a lane-parallel scan on
the TPU and the traceback pointer walk runs on device too, so the host
only converts the returned op codes into run-length CIGAR entries and
does the =/X rewrite (native/swalign.cpp::finish_alignment).

Reformulation notes (per DP row i over ref lanes j, band
[beg, endj] = [max(0, i-bw), min(r-1, i+bw)]):

  * the E layer (gap in read) depends only on row i-1 -> elementwise.
  * the F layer (gap in ref) recurrence f_j = max(h_{j-1}-go, f_{j-1}-ge)
    with h_j = max(a_j, max(f_j, 0)) collapses (go > ge, h >= 0) to
        f_j = max(max(a_{j-1}, 0) - go, f_{j-1} - ge)
    a max-plus prefix scan along the lane axis:
        f_j = max(cummax(u_k + k*ge)[j] - j*ge, (beg-1-j)*ge)
    with u_k = max(a_{k-1}, 0) - go and the second term the f=0 row seed.
  * direction bits replicate the oracle's exact tie rules
    (t1 > t2 for E/F, t1 <= t2 preferring the diagonal for H) and are
    packed 5 bits/cell: de | df<<1 | dh<<2 (dh in 1..5, 0 = out of band).
  * band doubling (double while best < score1 and 2*bw <= max_len) runs
    as a device while_loop of score-only passes; one direction-emitting
    pass then runs at the final per-pair band, and a fixed-length scan
    walks the pointers for all pairs in lock-step (layer automaton with
    the oracle's out-of-band/zero-direction failure semantics).

Monotonicity argument used for the doubling loop (why per-pass best at
the final band equals the oracle's best accumulated across passes):
in-band h values are monotone non-decreasing in bw.  The only
mask-dependent read that can DECREASE when unmasked is e_up (e can be
negative); but a negative e never reaches h (e enters h clamped at 0 and
the chain e-ge only decays until refreshed by the mask-independent
h_up-go), so widening the band never lowers any h cell, and the oracle's
carried-over best equals the final pass's best.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GAP_OPEN = 3
GAP_EXTEND = 1
MATCH = 2
MISMATCH = 2

_BIG = np.int32(0x3FFFFFFF)  # np not jnp: module-level jnp constants
# initialize the backend at import time (see ops/swdev.py)

_BP = 128   # pairs per Pallas program (the lane axis)


def _shift_sub(codes_t, begin, size):
    """codes_t [L, P] -> sub[t] = codes[begin + t] (4 past the end).

    Barrel shift by `begin` via log2 select+roll (per-pair XLA gathers
    cost ~18 ns/element on this backend; rolls are cheap)."""
    L, P = codes_t.shape
    pad = jnp.full((size, P), 4, jnp.int32)
    x = jnp.concatenate([codes_t, pad], axis=0)
    n = int(x.shape[0])
    sh = begin.astype(jnp.int32)
    for b in range(max(1, (n - 1).bit_length())):
        step = 1 << b
        if step >= n:
            break
        x = jnp.where((sh & step).astype(bool)[None, :],
                      jnp.roll(x, -step, axis=0), x)
    return x[:size]


def _fill_pass(read_t, sub_ref, m, r, bw, m_max: int, emit_dirs: bool):
    """One banded DP pass at band width bw (all [P] data args).

    read_t [m_max, P] subregion read codes, sub_ref [P, NL] subregion ref
    codes.  Returns (best [P], dirs [m_max, P, NL] int8 or None)."""
    P = sub_ref.shape[0]
    NL = sub_ref.shape[1]
    j_l = jax.lax.broadcasted_iota(jnp.int32, (P, NL), 1)
    r_1 = (r - 1)[:, None]
    bw_c = bw[:, None]
    s_ref_valid = sub_ref < 4

    def row(carry, xs):
        h_up, e_up, best = carry
        read_i, i = xs
        beg = jnp.maximum(0, i - bw_c)
        endj = jnp.minimum(r_1, i + bw_c)
        inb = (j_l >= beg) & (j_l <= endj)
        row_act = (i < m)[:, None]
        in_up = j_l <= (i - 1 + bw_c)
        hu = jnp.where(in_up, h_up, 0)
        eu = jnp.where(in_up, e_up, 0)
        t1e = hu - GAP_OPEN
        t2e = eu - GAP_EXTEND
        e_cur = jnp.maximum(t1e, t2e)
        e1 = jnp.maximum(e_cur, 0)
        # h_diag = h_up[j-1], 0 at j == beg
        hd = jnp.where(j_l == beg, 0,
                       jnp.concatenate([jnp.zeros((P, 1), jnp.int32),
                                        h_up[:, :-1]], axis=1))
        s = jnp.where((sub_ref == read_i[:, None]) & s_ref_valid,
                      MATCH, -MISMATCH)
        t2 = hd + s
        a = jnp.maximum(e1, t2)
        # F max-plus prefix scan (gap_extend == 1)
        am1 = jnp.where(j_l == beg, 0,
                        jnp.concatenate([jnp.zeros((P, 1), jnp.int32),
                                         a[:, :-1]], axis=1))
        u = jnp.maximum(am1, 0) - GAP_OPEN
        v = jnp.where(inb, u + j_l, -_BIG)
        run = jax.lax.cummax(v, axis=1)
        f = jnp.maximum(run - j_l, beg - 1 - j_l)
        f1 = jnp.maximum(f, 0)
        h = jnp.maximum(a, f1)
        ok = inb & row_act
        best = jnp.maximum(best, jnp.max(jnp.where(ok, h, 0), axis=1))
        h_out = jnp.where(ok, h, 0)
        e_out = jnp.where(ok, e_cur, 0)
        if not emit_dirs:
            return (h_out, e_out, best), jnp.int32(0)
        de = (t1e > t2e).astype(jnp.int32)
        hm1 = jnp.where(j_l == beg, 0,
                        jnp.concatenate([jnp.zeros((P, 1), jnp.int32),
                                         h[:, :-1]], axis=1))
        fm1 = jnp.where(j_l == beg, 0,
                        jnp.concatenate([jnp.zeros((P, 1), jnp.int32),
                                         f[:, :-1]], axis=1))
        df = (hm1 - GAP_OPEN > fm1 - GAP_EXTEND).astype(jnp.int32)
        t1h = jnp.maximum(e1, f1)
        dh = jnp.where(t1h <= t2, 1,
                       jnp.where(e1 > f1, 2 + de, 4 + df))
        packed = jnp.where(ok, de | (df << 1) | (dh << 2), 0)
        return (h_out, e_out, best), packed.astype(jnp.int8)

    init = (jnp.zeros((P, NL), jnp.int32), jnp.zeros((P, NL), jnp.int32),
            jnp.zeros((P,), jnp.int32))
    xs = (read_t[:m_max], jnp.arange(m_max, dtype=jnp.int32)[:, None])
    (_, _, best), dirs = jax.lax.scan(row, init, xs)
    return best, (dirs if emit_dirs else None)


def _sdj(x, k, fill):
    """Sublane shift: out[j] = x[j-k] (head filled) — the j-1 reads and
    the cummax doubling steps of the row recurrence."""
    return jnp.concatenate(
        [jnp.full((k,) + x.shape[1:], fill, x.dtype), x[:-k]], axis=0)


def _fill_kernel(read_ref, ref_ref, m_ref, r_ref, bw_ref,
                 dirs_ref, best_ref, h_ref, e_ref, *, m_max: int):
    """One banded DP pass for a block of _BP pairs; ref positions j ride
    the sublane axis (shift-friendly), pairs ride the 128 lanes.  The
    whole row loop lives in-kernel with the h/e carry in VMEM scratch —
    the XLA scan formulation (_fill_pass) pays ~0.7 ms/row of per-step
    overhead for the same arithmetic."""
    NL = ref_ref.shape[0]
    m = m_ref[...]                                        # [1, BP]
    r = r_ref[...]
    bw = bw_ref[...]
    ref = ref_ref[...]                                    # [NL, BP]
    j = jax.lax.broadcasted_iota(jnp.int32, (NL, 1), 0)
    r_1 = r - 1
    s_valid = ref < 4
    h_ref[...] = jnp.zeros_like(h_ref)
    e_ref[...] = jnp.zeros_like(e_ref)

    def row(i, best):
        h_up = h_ref[...]
        e_up = e_ref[...]
        beg = jnp.maximum(0, i - bw)                      # [1, BP]
        inb = (j >= beg) & (j <= jnp.minimum(r_1, i + bw))
        row_act = i < m                                   # [1, BP]
        in_up = j <= (i - 1 + bw)
        hu = jnp.where(in_up, h_up, 0)
        eu = jnp.where(in_up, e_up, 0)
        t1e = hu - GAP_OPEN
        t2e = eu - GAP_EXTEND
        e_cur = jnp.maximum(t1e, t2e)
        e1 = jnp.maximum(e_cur, 0)
        at_beg = j == beg
        hd = jnp.where(at_beg, 0, _sdj(h_up, 1, jnp.int32(0)))
        read_i = read_ref[pl.ds(i, 1), :]                 # [1, BP]
        s = jnp.where((ref == read_i) & s_valid, MATCH, -MISMATCH)
        t2 = hd + s
        a = jnp.maximum(e1, t2)
        am1 = jnp.where(at_beg, 0, _sdj(a, 1, jnp.int32(0)))
        v = jnp.where(inb, jnp.maximum(am1, 0) - GAP_OPEN + j, -_BIG)
        k = 1
        while k < NL:
            v = jnp.maximum(v, _sdj(v, k, -_BIG))
            k *= 2
        f = jnp.maximum(v - j, beg - 1 - j)
        f1 = jnp.maximum(f, 0)
        h = jnp.maximum(a, f1)
        ok = inb & row_act
        best = jnp.maximum(best,
                           jnp.max(jnp.where(ok, h, 0), axis=0,
                                   keepdims=True))
        h_ref[...] = jnp.where(ok, h, 0)
        e_ref[...] = jnp.where(ok, e_cur, 0)
        de = (t1e > t2e).astype(jnp.int32)
        hm1 = jnp.where(at_beg, 0, _sdj(h, 1, jnp.int32(0)))
        fm1 = jnp.where(at_beg, 0, _sdj(f, 1, jnp.int32(0)))
        df = (hm1 - GAP_OPEN > fm1 - GAP_EXTEND).astype(jnp.int32)
        t1h = jnp.maximum(e1, f1)
        dh = jnp.where(t1h <= t2, 1,
                       jnp.where(e1 > f1, 2 + de, 4 + df))
        packed = jnp.where(ok, de | (df << 1) | (dh << 2), 0)
        dirs_ref[pl.ds(i, 1), :, :] = packed.astype(jnp.int8)[None]
        return best

    best = jax.lax.fori_loop(
        0, m_max, row, jnp.zeros((1, ref.shape[1]), jnp.int32))
    best_ref[...] = best


def _fill_pallas(read_t, ref_t, m, r, bw, m_max: int):
    """Pallas dispatch of one banded pass (TPU path).  read_t [m_max, P],
    ref_t [NL, P], P a multiple of _BP.  Returns (best [P],
    dirs [m_max, NL, P] int8)."""
    NL, P = ref_t.shape
    assert P % _BP == 0
    row1 = lambda a: a.astype(jnp.int32).reshape(1, P)
    dirs, best = pl.pallas_call(
        partial(_fill_kernel, m_max=m_max),
        grid=(P // _BP,),
        in_specs=[
            pl.BlockSpec((m_max, _BP), lambda g: (0, g)),
            pl.BlockSpec((NL, _BP), lambda g: (0, g)),
            pl.BlockSpec((1, _BP), lambda g: (0, g)),
            pl.BlockSpec((1, _BP), lambda g: (0, g)),
            pl.BlockSpec((1, _BP), lambda g: (0, g)),
        ],
        out_specs=[
            pl.BlockSpec((m_max, NL, _BP), lambda g: (0, 0, g)),
            pl.BlockSpec((1, _BP), lambda g: (0, g)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_max, NL, P), jnp.int8),
            jax.ShapeDtypeStruct((1, P), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((NL, _BP), jnp.int32),
                        pltpu.VMEM((NL, _BP), jnp.int32)],
    )(read_t, ref_t, row1(m), row1(r), row1(bw))
    return best[0], dirs


@partial(jax.jit, static_argnames=("m_max", "n_steps", "use_pallas"))
def _banded_tb_jit(read_codes, query_begin, query_end, ref_codes,
                   ref_begin, ref_end, score1, m_max: int, n_steps: int,
                   use_pallas: bool = False):
    LQ = read_codes.shape[1]
    P = read_codes.shape[0]
    NL = ref_codes.shape[1]
    qb = query_begin.astype(jnp.int32)
    m = (query_end - query_begin + 1).astype(jnp.int32)
    rb = ref_begin.astype(jnp.int32)
    r = (ref_end - ref_begin + 1).astype(jnp.int32)
    score1 = score1.astype(jnp.int32)

    read_t = _shift_sub(read_codes.astype(jnp.int32).T, qb, m_max)
    ref_t = _shift_sub(ref_codes.astype(jnp.int32).T, rb, NL)
    sub_ref = ref_t.T                                        # [P, NL]

    max_len = jnp.maximum(m, r)
    bw0 = jnp.abs(r - m) + 1

    if use_pallas:
        # band doubling as a FIXED-length scan (a while_loop's any(~done)
        # cond costs ~7 ms/iteration on this backend; a full Pallas pass
        # costs 0.5 ms, so always running the worst-case pass count is far
        # cheaper).  bw doubles at most ceil(log2(max_len)) + 1 times
        # before 2*bw > max_len stops it; done pairs keep their bw, so the
        # extra passes recompute already-final results and change nothing.
        n_passes = max(1, (max(m_max, NL) - 1).bit_length() + 1)

        def body(c, _):
            bw, done = c
            best_p, _ = _fill_pallas(read_t, ref_t, m, r, bw, m_max)
            now = (best_p >= score1) | (2 * bw > max_len)
            bw = jnp.where(done | now, bw, 2 * bw)
            return (bw, done | now), None

        (bw_f, _), _ = jax.lax.scan(
            body, (bw0, jnp.zeros((P,), bool)), None, length=n_passes)
        _, dirs = _fill_pallas(read_t, ref_t, m, r, bw_f, m_max)
    else:
        # XLA path (CPU / interpret): score-only doubling + one
        # direction-emitting pass at the final band
        def cond(c):
            return jnp.any(~c[1])

        def body(c):
            bw, done = c
            best, _ = _fill_pass(read_t, sub_ref, m, r, bw, m_max, False)
            now = (best >= score1) | (2 * bw > max_len)
            bw = jnp.where(done | now, bw, 2 * bw)
            return bw, done | now

        bw_f, _ = jax.lax.while_loop(
            cond, body, (bw0, jnp.zeros((P,), bool)))

        _, dirs = _fill_pass(read_t, sub_ref, m, r, bw_f, m_max, True)
        dirs = dirs.transpose(0, 2, 1)           # -> [m_max, NL, P]
    # flat [m_max * NL * P] for the walk's 1D gather
    flat = dirs.reshape(-1)

    # traceback walk, all pairs in lock-step
    p_idx = jnp.arange(P, dtype=jnp.int32)

    def step(carry, _):
        i, j, layer, failed, ndone = carry
        active = ~ndone & ~failed
        oob = jnp.abs(j - i) > bw_f
        d8 = flat[(jnp.clip(i, 0, m_max - 1) * NL
                   + jnp.clip(j, 0, NL - 1)) * P + p_idx].astype(jnp.int32)
        d = jnp.where(layer == 0, 2 + (d8 & 1),
                      jnp.where(layer == 1, 4 + ((d8 >> 1) & 1),
                                (d8 >> 2)))
        bad = active & (oob | (d == 0) | (d > 5))
        mv = active & ~bad
        # op codes: 1 M, 2 I, 3 D (0 = no step)
        op = jnp.where(d == 1, 1, jnp.where(d <= 3, 2, 3))
        di = jnp.where(d <= 3, 1, 0)
        dj = jnp.where((d == 1) | (d >= 4), 1, 0)
        nl = jnp.where(d == 1, 2,
                       jnp.where(d == 2, 0, jnp.where(d == 3, 2,
                                 jnp.where(d == 4, 1, 2))))
        i = jnp.where(mv, i - di, i)
        j = jnp.where(mv, j - dj, j)
        layer = jnp.where(mv, nl, layer)
        failed = failed | bad
        ndone = ndone | ~((i >= 0) & (j > 0)) | failed
        return (i, j, layer, failed, ndone), \
            jnp.where(mv, op, 0).astype(jnp.int8)

    init = (m - 1, r - 1, jnp.full((P,), 2, jnp.int32),
            jnp.zeros((P,), bool), ~((m - 1 >= 0) & (r - 1 > 0)))
    (_, _, _, failed, _), ops = jax.lax.scan(
        step, init, None, length=n_steps)
    return ops.T, failed, bw_f                       # ops [P, n_steps]


def banded_traceback_batch(read_codes, query_begin, query_end,
                           ref_codes, ref_begin, ref_end, score1):
    """Device banded DP + traceback for a batch of scored pairs.

    read_codes [P, LQ] int8 0..4, ref_codes [P, NL] int8; begin/end are
    the device score pass's matched subregion bounds (inclusive), score1
    the target score.  Returns (ops [P, S] int8 — backward-order walk
    codes 1=M 2=I 3=D, 0 past the end — and fail [P] bool mirroring the
    oracle's traceback-failure flag).  The caller feeds ops to
    native/swalign.cpp (hrm_ssw_finish_batch with dev_ops), which builds
    the run-length entries exactly like its own walk would.
    """
    return banded_traceback_dispatch(read_codes, query_begin, query_end,
                                     ref_codes, ref_begin, ref_end, score1)


def banded_traceback_dispatch(read_codes, query_begin, query_end,
                              ref_codes, ref_begin, ref_end, score1):
    """Enqueue without synchronizing (same contract as
    swdev.ssw_score_dispatch): returns device arrays (ops, fail)."""
    LQ = int(read_codes.shape[1])
    NL = int(ref_codes.shape[1])
    P = int(read_codes.shape[0])
    use_pallas = (jax.default_backend() == "tpu" and P % _BP == 0)
    ops, failed, _ = _banded_tb_jit(
        jnp.asarray(read_codes), jnp.asarray(query_begin),
        jnp.asarray(query_end), jnp.asarray(ref_codes),
        jnp.asarray(ref_begin), jnp.asarray(ref_end),
        jnp.asarray(score1), m_max=LQ, n_steps=LQ + NL - 1,
        use_pallas=use_pallas)
    return ops, failed


def banded_traceback_collect(dev):
    ops, failed = dev
    return np.asarray(ops), np.asarray(failed)
