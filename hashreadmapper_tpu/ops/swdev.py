"""Batched on-device SSW score pass (STEP-2 fine alignment, device side).

Lane-exact, closed-form reformulation of the striped byte-mode
Smith-Waterman pass (reference: src/ssw.c:197-398 sw_sse2_byte, driven from
src/gpu/mappinghandler.cu:560-595).  The observable semantics to match are
those of align/sw.py::_striped_pass (golden-verified against the compiled
reference SSW): the striped E-lag makes maxColumn[] depend on segLen and
lane count, so the 16 uint8 lanes are simulated faithfully — but the two
sequential inner loops of the scalar algorithm are collapsed into closed
forms so each genome-window column costs O(1) vector ops instead of
O(segLen * lanes) scalar steps:

  main j-loop   the only loop-carried value is vF, and its recurrence
                vf_{j+1} = max(vf_j - gapE, pre_j - gapO, 0) is a max-plus
                prefix scan  =>  vf_j = max(cummax(pre_t + gapE*t)[j-1]
                                             - gapO - gapE*(j-1), 0).
  lazy-F loop   within one pass vF only decays (no H feedback), so the vF
                seen at (pass kk, row j, lane k) is
                max(vf_init[k-kk] - (kk-1)*segLen - j, 0); the early-exit
                point is the first (kk, j) in lex order where no lane can
                still improve H, found with one argmax over the
                [lanes, S, lanes] condition tensor.

Everything is int32 arithmetic (the uint8 bias/saturation semantics are
emulated exactly); pairs whose score saturates (score1 + bias >= 255) are
flagged and the caller re-runs them through the host word-mode path, exactly
as ssw_align does (align/sw.py:379-388).

The reverse pass (begin positions, ssw.c:877-886) runs the same kernel on
the reversed read prefix with descending columns and terminate = score1;
early-exit semantics are reproduced with a per-pair `stopped` flag.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

LANES = 16          # byte-mode SSE lanes (ssw.c sw_sse2_byte)
GAP_OPEN = 3
GAP_EXTEND = 1
MATCH = 2
MISMATCH = 2
BIAS = MISMATCH     # byte-mode bias = -min(score_matrix)
SAT = 255

_BIG = jnp.int32(0x3FFFFFFF)


def _column_update(h_prev, e_old, pre_mask, read_at, seg_len, ref_base,
                   pad_profile):
    """One striped byte-mode column, closed form.

    h_prev, e_old: [S, 16] int32 state from the previous column.
    pre_mask:      [S, 16] bool, True where pos < read_len (real positions).
    read_at:       [S, 16] int32 read codes at each striped position.
    seg_len:       traced scalar (ceil(read_len / 16)).
    ref_base:      traced scalar ref code for this column.
    pad_profile:   [S, 16] int32 profile value at padding positions (= bias).

    Returns (h_fin, e_new, colmax).
    """
    S = h_prev.shape[0]
    j_col = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)    # [S,1]
    arow = j_col < seg_len                                    # [S,1] active

    match = (read_at == ref_base) & (ref_base < 4)
    p = jnp.where(pre_mask, jnp.where(match, MATCH + BIAS, -MISMATCH + BIAS),
                  pad_profile)

    # vh_in[0] = lane-shift(h_prev[seg_len-1]); vh_in[j>0] = h_prev[j-1]
    last = jax.lax.dynamic_index_in_dim(
        h_prev, jnp.clip(seg_len - 1, 0, S - 1), axis=0, keepdims=False)
    row0 = jnp.concatenate([jnp.zeros((1,), jnp.int32), last[:-1]])
    vh_in = jnp.concatenate([row0[None, :], h_prev[:-1]], axis=0)

    a = jnp.maximum(jnp.minimum(vh_in + p, SAT) - BIAS, 0)
    pre = jnp.maximum(a, e_old)
    pre = jnp.where(arow, pre, 0)

    # vF chain closed form (max-plus prefix scan per lane)
    g = pre + GAP_EXTEND * j_col
    run = jax.lax.cummax(g, axis=0)
    vf = jnp.concatenate(
        [jnp.zeros((1, LANES), jnp.int32),
         run[:-1] - GAP_OPEN - GAP_EXTEND * (j_col[1:] - 1)], axis=0)
    vf = jnp.maximum(vf, 0)
    h_main = jnp.where(arow, jnp.maximum(pre, vf), 0)
    e_new = jnp.where(
        arow,
        jnp.maximum(jnp.maximum(e_old - GAP_EXTEND, 0),
                    jnp.maximum(h_main - GAP_OPEN, 0)), 0)
    # vF after the last active row = lazy-F input
    run_last = jax.lax.dynamic_index_in_dim(
        run, jnp.clip(seg_len - 1, 0, S - 1), axis=0, keepdims=False)
    vf_init = jnp.maximum(run_last - GAP_OPEN - GAP_EXTEND * (seg_len - 1), 0)

    # --- lazy-F, closed form over passes kk = 1..16 ---
    # base(kk)[k] = vf_init[k-kk] - (kk-1)*segLen ; vF(kk,j) = max(base-j, 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (LANES, 1), 0) + 1   # [16,1]
    k_l = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)  # [16,16]
    src = k_l - kk                                                # [16,16]
    vi = jnp.where(src >= 0, vf_init[jnp.clip(src, 0, LANES - 1)], 0)
    base = vi - (kk - 1) * seg_len                                # [16,16]
    cbase = jax.lax.cummax(base, axis=0)                          # [16,16]

    jj = j_col[None, :, :]                                        # [1,S,1]
    h_upd = jnp.maximum(h_main[None],
                        jnp.maximum(cbase[:, None, :] - jj, 0))   # [16,S,16]
    vhg = jnp.maximum(h_upd - GAP_OPEN, 0)
    vf_next = jnp.maximum(base[:, None, :] - (jj + 1), 0)
    cond = ~jnp.any(vf_next > vhg, axis=2) & arow[None, :, 0]     # [16,S]

    flat = cond.reshape(-1)
    has_stop = jnp.any(flat)
    first = jnp.argmax(flat).astype(jnp.int32)
    kk_s = first // S                # 0-based pass index of the stop
    j_s = first % S
    cb_stop = cbase[kk_s]                                         # [16]
    cb_prev = jnp.where(kk_s >= 1, cbase[jnp.maximum(kk_s - 1, 0)],
                        jnp.zeros((LANES,), jnp.int32))
    merge = jnp.where(j_col <= j_s, cb_stop[None, :], cb_prev[None, :])
    merge = jnp.where(has_stop, merge, cbase[LANES - 1][None, :])
    h_fin = jnp.where(arow, jnp.maximum(h_main,
                                        jnp.maximum(merge - j_col, 0)), 0)

    colmax = jnp.max(h_fin)
    return h_fin, e_new, colmax


def _striped_pass_single(read_codes, read_len, ref_codes, ref_len,
                         terminate, ref_dir: int, n_cols: int):
    """One pair, full pass.  Static: shapes, ref_dir, n_cols.

    Returns (best, end_ref, end_read, max_column[n_cols], overflowed).
    max_column is indexed by the actual column id i (only meaningful for
    ref_dir == 0; the reverse pass ignores it).
    """
    lq = read_codes.shape[0]
    S = (lq + LANES - 1) // LANES
    seg_len = (read_len + LANES - 1) // LANES

    j_col = jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 0)
    k_col = jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 1)
    pos = j_col + k_col * seg_len
    pre_mask = pos < read_len
    read_at = jnp.where(pre_mask,
                        read_codes[jnp.clip(pos, 0, lq - 1)].astype(jnp.int32),
                        4)
    pad_profile = jnp.full((S, LANES), BIAS, jnp.int32)

    def body(carry, t):
        h_prev, e_old, best, end_ref, snap, stopped, overflowed = carry
        i = t if ref_dir == 0 else ref_len - 1 - t
        in_range = (i >= 0) & (i < ref_len)
        active = in_range & ~stopped

        ref_base = ref_codes[jnp.clip(i, 0, ref_codes.shape[0] - 1)]
        h_fin, e_new, colmax = _column_update(
            h_prev, e_old, pre_mask, read_at, seg_len,
            ref_base.astype(jnp.int32), pad_profile)

        improved = active & (colmax > best)
        ovf_now = improved & (colmax + BIAS >= SAT)
        take_end = improved & ~ovf_now
        best_n = jnp.where(improved, colmax, best)
        end_ref_n = jnp.where(take_end, i, end_ref)
        snap_n = jnp.where(take_end, h_fin, snap)
        # column writeback (the breaking column is still written)
        mc = jnp.where(active, colmax, 0)
        stopped_n = stopped | ovf_now | (active & (colmax == terminate))
        h_out = jnp.where(active, h_fin, h_prev)
        e_out = jnp.where(active, e_new, e_old)
        return ((h_out, e_out, best_n, end_ref_n, snap_n, stopped_n,
                 overflowed | ovf_now),
                (mc, jnp.where(active, i, -1)))

    init = (jnp.zeros((S, LANES), jnp.int32), jnp.zeros((S, LANES), jnp.int32),
            jnp.int32(0), jnp.int32(-1),
            jnp.full((S, LANES), -1, jnp.int32),
            jnp.bool_(False), jnp.bool_(False))
    (h_prev, e_old, best, end_ref, snap, stopped, overflowed), \
        (mc_vals, mc_idx) = jax.lax.scan(
            body, init, jnp.arange(n_cols, dtype=jnp.int32))

    if ref_dir == 0:
        max_column = mc_vals  # column t == i for the forward pass
    else:
        max_column = jnp.zeros((n_cols,), jnp.int32)
        max_column = max_column.at[jnp.clip(mc_idx, 0, n_cols - 1)].max(
            jnp.where(mc_idx >= 0, mc_vals, 0))

    # end_read: smallest striped position holding `best` in the snapshot
    # (ssw.c:344-350); inactive rows were snapped as -1 and never match.
    pos_flat = pos.reshape(-1)
    snap_flat = snap.reshape(-1)
    cand = jnp.where(snap_flat == best, pos_flat, _BIG)
    end_read = jnp.minimum(jnp.min(cand), read_len - 1)

    overflowed = overflowed | (best + BIAS >= SAT)
    best = jnp.where(overflowed, SAT, best)
    return best, end_ref, end_read, max_column, overflowed


@partial(jax.jit, static_argnames=("n_cols",))
def ssw_forward_batch(read_codes, read_len, ref_codes, ref_len, mask_len,
                      n_cols: int):
    """Forward byte-mode pass for a batch of pairs.

    read_codes [P, LQ] int8 (0..4), read_len [P], ref_codes [P, LR] int8,
    ref_len [P], mask_len [P].  n_cols: static column count (>= max ref_len).

    Returns dict of [P] arrays: score1, ref_end, query_end, score2,
    ref_end2, overflowed.  Pairs with overflowed=True must be re-run on the
    host word-mode path (ssw_align falls back the same way).
    """
    def one(rc, rl, fc, fl, ml):
        best, end_ref, end_read, max_column, ovf = _striped_pass_single(
            rc, rl, fc, fl, jnp.int32(SAT), 0, n_cols)
        # second-best outside the masked window (byte quirk: second range
        # starts one PAST the edge, ssw.c:367-381)
        i_idx = jnp.arange(n_cols, dtype=jnp.int32)
        lo = jnp.maximum(0, end_ref - ml)
        hi = jnp.minimum(fl, end_ref + ml)
        allowed = ((i_idx < lo) | (i_idx >= hi + 1)) & (i_idx < fl)
        masked = jnp.where(allowed, max_column, -1)
        s2 = jnp.max(masked)
        ref_end2 = jnp.where(s2 > 0, jnp.argmax(masked).astype(jnp.int32), 0)
        score2 = jnp.maximum(s2, 0)
        # maskLen < 15 -> no second-best reported (ssw.c:385-392)
        score2 = jnp.where(ml >= 15, score2, 0)
        ref_end2 = jnp.where(ml >= 15, ref_end2, -1)
        return best, end_ref, end_read, score2, ref_end2, ovf

    best, end_ref, end_read, score2, ref_end2, ovf = jax.vmap(one)(
        read_codes, read_len.astype(jnp.int32), ref_codes,
        ref_len.astype(jnp.int32), mask_len.astype(jnp.int32))
    return {"score1": best, "ref_end": end_ref, "query_end": end_read,
            "score2": score2, "ref_end2": ref_end2, "overflowed": ovf}


@partial(jax.jit, static_argnames=("n_cols",))
def ssw_reverse_batch(read_codes, read_len, ref_codes, score1, ref_end,
                      query_end, n_cols: int):
    """Reverse byte-mode pass: begin positions (ssw.c:877-886).

    Aligns reversed read[:query_end+1] against ref[:ref_end+1] with
    descending columns and terminate = score1.

    Returns dict of [P] arrays: ref_begin, query_begin, flag2 (score1 >
    rev_score, the reference's "missed small part" flag), overflowed.
    """
    lq = read_codes.shape[1]

    def one(rc, rl, fc, s1, re_, qe):
        t_idx = jnp.arange(lq, dtype=jnp.int32)
        rev = jnp.where(t_idx <= qe,
                        rc[jnp.clip(qe - t_idx, 0, lq - 1)], jnp.int8(4))
        rl_rev = qe + 1
        fl_rev = re_ + 1
        best, end_ref, end_read, _mc, ovf = _striped_pass_single(
            rev, rl_rev, fc, fl_rev, s1, 1, n_cols)
        return end_ref, qe - end_read, s1 > best, ovf

    ref_begin, query_begin, flag2, ovf = jax.vmap(one)(
        read_codes, read_len.astype(jnp.int32), ref_codes,
        score1.astype(jnp.int32), ref_end.astype(jnp.int32),
        query_end.astype(jnp.int32))
    return {"ref_begin": ref_begin, "query_begin": query_begin,
            "flag2": flag2, "overflowed": ovf}


def ssw_score_batch(read_codes, read_len, ref_codes, ref_len, mask_len):
    """Full device score pass: forward + reverse, host-side convenience.

    All inputs numpy; returns a dict of numpy arrays with score1, score2,
    ref_end, ref_end2, query_end, ref_begin, query_begin, flag
    (0 ok / 2 begin-missing, matching s_align flag semantics) and
    host_fallback (bool: byte-mode saturation -> caller must use the host
    word path for these pairs).
    """
    n_cols = int(ref_codes.shape[1])
    fwd = ssw_forward_batch(
        jnp.asarray(read_codes), jnp.asarray(read_len),
        jnp.asarray(ref_codes), jnp.asarray(ref_len),
        jnp.asarray(mask_len), n_cols)
    rev = ssw_reverse_batch(
        jnp.asarray(read_codes), jnp.asarray(read_len),
        jnp.asarray(ref_codes), fwd["score1"], fwd["ref_end"],
        fwd["query_end"], n_cols)
    out = {k: np.asarray(v) for k, v in {**fwd, **rev}.items()}
    flag = np.where(out["flag2"], 2, 0).astype(np.int32)
    fallback = np.asarray(fwd["overflowed"]) | np.asarray(rev["overflowed"])
    degenerate = (out["score1"] == 0) | (out["ref_end"] < 0)
    return {
        "score1": out["score1"], "score2": out["score2"],
        "ref_end": out["ref_end"], "ref_end2": out["ref_end2"],
        "query_end": out["query_end"], "ref_begin": out["ref_begin"],
        "query_begin": out["query_begin"], "flag": flag,
        "degenerate": degenerate,
        "host_fallback": np.asarray(fallback, dtype=bool),
    }
