"""Pallas striped-SW pass: swdev._pass_batched with VMEM-resident state.

Bit-identical reformulation of `ops/swdev.py::_pass_batched` (itself the
lane-exact closed-form of the reference's byte-mode striped SW,
src/ssw.c:197-398): the same per-column math, but the whole column loop
runs inside one Pallas program per 128-pair block with the H/E/snapshot
carries resident in VMEM scratch.  The XLA scan formulation streams its
three [S,16,P] carries (plus ~10 temporaries) through HBM on every one of
the n_cols iterations — which is the measured ~38 ms/2048-read cost
(PERF.md round-4 budget); here the traffic is one block load + one result
store.

Layout: everything is 2D (the remote Mosaic compiler SIGABRTs on the 3D
[S,16,BP] formulation) — the striped state lives as S static row-bands of
16 sublanes in [S*16, BP] scratch refs, the per-j loop is unrolled
(S <= 8), and all shifts/cummaxes are static 2D concatenates, exactly the
idiom proven in ops/vote_pallas.py / ops/bandtb.py.

Semantics notes (must stay in lock-step with swdev.py — shared constants
are imported from there):
* the striped E-lag is observable in maxColumn, so the 16 uint8 SSE lanes
  are simulated exactly (read_at layout from swdev._striped_layout);
* the main-loop vF recurrence is the max-plus prefix scan over S, which
  unrolls to the sequential run[j] = max(run[j-1], pre[j] + j);
* the lazy-F full propagation is the per-lane cummax closed form
  (see swdev.py for the derivation; fuzzed in tests/test_swdev.py);
* early exit / termination / saturation are per-pair `stopped` masks, as
  in the XLA version (the loop always runs n_cols columns).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .swdev import BIAS, GAP_EXTEND, GAP_OPEN, LANES, MATCH, MISMATCH, SAT

_BP = 128        # pairs per Pallas program (the lane axis)
_BIG = np.int32(0x3FFFFFFF)


def _row_cummax(x, n: int):
    """Inclusive cummax along the sublane axis (static length n)."""
    d = 1
    while d < n:
        pad = jnp.full((d, x.shape[1]), -_BIG, x.dtype)
        x = jnp.maximum(x, jnp.concatenate([pad, x[:-d]], axis=0))
        d *= 2
    return x


def _sw_kernel(readat_ref, rlen_ref, seglen_ref, reflen_ref, term_ref,
               ref_ref, out_ref, mc_ref, h_ref, e_ref, snap_ref, *,
               S: int, n_cols: int, ref_dir: int, want_mc: bool):
    BP = readat_ref.shape[1]
    L = LANES
    seg2 = seglen_ref[...]                                 # [1,BP]
    rlen2 = rlen_ref[...]
    ref_len = reflen_ref[...]
    terminate = term_ref[...]

    k2 = jax.lax.broadcasted_iota(jnp.int32, (L, BP), 0)
    segb = jnp.broadcast_to(seg2, (L, BP))
    rlenb = jnp.broadcast_to(rlen2, (L, BP))
    # per-band constants: striped positions, read codes, activity masks
    read_at = [readat_ref[j * L:(j + 1) * L, :] for j in range(S)]
    pos = [k2 * segb + j for j in range(S)]
    pre_mask = [pos[j] < rlenb for j in range(S)]
    arow = [jnp.broadcast_to(j < seg2, (L, BP)) for j in range(S)]
    is_last = [jnp.broadcast_to(jnp.maximum(seg2 - 1, 0) == j, (L, BP))
               for j in range(S)]
    rl_m1 = jnp.zeros((1, BP), jnp.int32)
    for j in range(S):
        rl_m1 = jnp.maximum(
            rl_m1, jnp.max(jnp.where(pre_mask[j], pos[j], 0), axis=0,
                           keepdims=True))

    h_ref[...] = jnp.zeros_like(h_ref)
    e_ref[...] = jnp.zeros_like(e_ref)
    snap_ref[...] = jnp.full_like(snap_ref, -1)

    def column(t, carry):
        # NOTE: every carried mask is int32 0/1, never bool — Mosaic on
        # this backend cannot legalize scf.for with vector<i1> carries
        # (the round-4 BENCH crash; reproduced with a minimal probe).
        # Bool intermediates within one iteration are fine.
        best, end_ref, stopped, overflowed = carry
        rb1 = ref_ref[pl.ds(t, 1), :]                      # [1,BP]
        rb = jnp.broadcast_to(rb1, (L, BP))
        if ref_dir == 0:
            i = jnp.zeros((1, BP), jnp.int32) + t
        else:
            i = ref_len - 1 - t
        in_range = (i >= 0) & (i < ref_len)
        active = in_range & (stopped == 0)

        h = [h_ref[j * L:(j + 1) * L, :] for j in range(S)]
        e = [e_ref[j * L:(j + 1) * L, :] for j in range(S)]

        # vh_in[0] = lane-shift of the last band's row; vh_in[j] = h[j-1]
        last = jnp.zeros((L, BP), jnp.int32)
        for j in range(S):
            last = jnp.where(is_last[j], h[j], last)
        row0 = jnp.concatenate(
            [jnp.zeros((1, BP), jnp.int32), last[:-1]], axis=0)
        vh_in = [row0] + h[:-1]

        pre = []
        run = []
        r_prev = jnp.full((L, BP), -_BIG, jnp.int32)
        for j in range(S):
            match = (read_at[j] == rb) & (rb < 4)
            p = jnp.where(pre_mask[j],
                          jnp.where(match, MATCH + BIAS, -MISMATCH + BIAS),
                          BIAS)
            a = jnp.maximum(jnp.minimum(vh_in[j] + p, SAT) - BIAS, 0)
            pj = jnp.where(arow[j], jnp.maximum(a, e[j]), 0)
            pre.append(pj)
            r_prev = jnp.maximum(r_prev, pj + j)           # gapE = 1
            run.append(r_prev)

        h_main = []
        e_new = []
        for j in range(S):
            vf = jnp.maximum(run[j - 1] - GAP_OPEN - (j - 1), 0) \
                if j > 0 else jnp.zeros((L, BP), jnp.int32)
            hm = jnp.where(arow[j], jnp.maximum(pre[j], vf), 0)
            h_main.append(hm)
            e_new.append(jnp.where(
                arow[j],
                jnp.maximum(jnp.maximum(e[j] - GAP_EXTEND, 0),
                            jnp.maximum(hm - GAP_OPEN, 0)), 0))

        run_last = jnp.zeros((L, BP), jnp.int32)
        for j in range(S):
            run_last = jnp.where(is_last[j], run[j], run_last)
        vf_init = jnp.maximum(run_last - GAP_OPEN - (segb - 1), 0)

        # lazy-F full propagation: per-lane cummax closed form
        g2 = vf_init + k2 * segb
        cmax = _row_cummax(g2, L)
        prev = jnp.concatenate(
            [jnp.full((1, BP), -_BIG, jnp.int32), cmax[:-1]], axis=0)
        corr = prev - (k2 - 1) * segb                      # [L,BP]

        colmax = jnp.zeros((1, BP), jnp.int32)
        h_fin = []
        for j in range(S):
            hf = jnp.where(
                arow[j],
                jnp.maximum(h_main[j], jnp.maximum(corr - j, 0)), 0)
            h_fin.append(hf)
            colmax = jnp.maximum(colmax,
                                 jnp.max(hf, axis=0, keepdims=True))

        improved = active & (colmax > best)
        ovf_now = improved & (colmax + BIAS >= SAT)
        take_end = improved & ~ovf_now
        best = jnp.where(improved, colmax, best)
        end_ref = jnp.where(take_end, i, end_ref)
        stop_now = ovf_now | (active & (colmax == terminate))
        stopped = stopped | stop_now.astype(jnp.int32)
        takeb = jnp.broadcast_to(take_end, (L, BP))
        actb = jnp.broadcast_to(active, (L, BP))
        for j in range(S):
            sl = slice(j * L, (j + 1) * L)
            snap_ref[sl, :] = jnp.where(takeb, h_fin[j], snap_ref[sl, :])
            h_ref[sl, :] = jnp.where(actb, h_fin[j], h[j])
            e_ref[sl, :] = jnp.where(actb, e_new[j], e[j])
        if want_mc:
            mc_ref[pl.ds(t, 1), :] = jnp.where(active, colmax, 0)
        return (best, end_ref, stopped,
                overflowed | ovf_now.astype(jnp.int32))

    z = jnp.zeros((1, BP), jnp.int32)
    init = (z, jnp.full((1, BP), -1, jnp.int32), z, z)
    best, end_ref, _, overflowed = jax.lax.fori_loop(
        0, n_cols, column, init)

    # end_read: smallest striped position holding `best` in the snapshot
    cand = jnp.full((1, BP), _BIG, jnp.int32)
    bestb = jnp.broadcast_to(best, (L, BP))
    for j in range(S):
        snap_j = snap_ref[j * L:(j + 1) * L, :]
        cj = jnp.where(snap_j == bestb, pos[j], _BIG)
        cand = jnp.minimum(cand, jnp.min(cj, axis=0, keepdims=True))
    end_read = jnp.minimum(cand, rl_m1)
    out_ref[0:1, :] = best
    out_ref[1:2, :] = end_ref
    out_ref[2:3, :] = end_read
    out_ref[3:4, :] = overflowed
    if not want_mc:
        mc_ref[...] = jnp.zeros_like(mc_ref)   # (1,BP) dummy, see wrapper


@partial(jax.jit, static_argnames=("ref_dir", "n_cols", "want_max_column",
                                   "interpret"))
def pass_batched_pallas(read_at, eff_read_len, seg_len, ref_t, ref_len,
                        terminate, ref_dir: int, n_cols: int,
                        want_max_column: bool, interpret: bool = False):
    """Drop-in for swdev._pass_batched (same returns, same semantics).

    read_at [S,16,P] int32 striped codes (pads already 4),
    eff_read_len [P] (the length pre_mask tests pos against — the read
    length forward, query_end+1 reverse), seg_len [P], ref_t [n_cols,P]
    (pre-reversed per pair for the reverse pass), ref_len [P],
    terminate [P].
    """
    S = read_at.shape[0]
    P = read_at.shape[2]
    n_pad = (-P) % _BP
    if n_pad:
        read_at = jnp.pad(read_at, ((0, 0), (0, 0), (0, n_pad)),
                          constant_values=4)
        eff_read_len = jnp.pad(eff_read_len, (0, n_pad),
                               constant_values=1)
        seg_len = jnp.pad(seg_len, (0, n_pad), constant_values=1)
        ref_t = jnp.pad(ref_t, ((0, 0), (0, n_pad)))
        ref_len = jnp.pad(ref_len, (0, n_pad))
        terminate = jnp.pad(terminate, (0, n_pad), constant_values=SAT)
    Pp = P + n_pad
    read_2d = read_at.astype(jnp.int32).reshape(S * LANES, Pp)
    row1 = lambda a: a.astype(jnp.int32).reshape(1, Pp)
    blk = lambda: pl.BlockSpec((1, _BP), lambda g: (0, g))
    # max_column is only materialized when wanted; otherwise a (1,BP)
    # zero-written dummy (no dead n_cols-sized VMEM/HBM block)
    mc_rows = n_cols if want_max_column else 1
    out_specs = [pl.BlockSpec((4, _BP), lambda g: (0, g)),
                 pl.BlockSpec((mc_rows, _BP), lambda g: (0, g))]
    out_shape = [jax.ShapeDtypeStruct((4, Pp), jnp.int32),
                 jax.ShapeDtypeStruct((mc_rows, Pp), jnp.int32)]
    out, mc = pl.pallas_call(
        partial(_sw_kernel, S=S, n_cols=n_cols, ref_dir=ref_dir,
                want_mc=want_max_column),
        grid=(Pp // _BP,),
        in_specs=[
            pl.BlockSpec((S * LANES, _BP), lambda g: (0, g)),
            blk(), blk(), blk(), blk(),
            pl.BlockSpec((n_cols, _BP), lambda g: (0, g)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((S * LANES, _BP), jnp.int32),
                        pltpu.VMEM((S * LANES, _BP), jnp.int32),
                        pltpu.VMEM((S * LANES, _BP), jnp.int32)],
        interpret=interpret,
    )(read_2d, row1(eff_read_len), row1(seg_len),
      row1(ref_len), row1(terminate),
      ref_t.astype(jnp.int32)[:n_cols])
    best = out[0, :P]
    end_ref = out[1, :P]
    end_read = out[2, :P]
    overflowed = out[3, :P].astype(bool)
    overflowed = overflowed | (best + BIAS >= SAT)
    best = jnp.where(overflowed, SAT, best)
    max_column = mc[:, :P] if want_max_column else None
    return best, end_ref, end_read, max_column, overflowed
