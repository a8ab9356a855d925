"""Pallas TPU kernel: fused candidate vote (merge + run-length filter).

TPU-native re-design of keepDistinctByFrequency (reference:
include/gpu/minhashqueryfilter.cuh:123-279, which sorts the concatenated
per-table matches with cub and run-length-filters them).  The XLA
formulation (index/minhash_index.py::vote_candidates) lowers the bitonic
merge tree to ~35 separate HLO passes over HBM; here the whole pipeline —
merge F ascending C-wide lists, run-length count, min-table-hits filter,
rank-compaction to out_cap slots — runs in ONE kernel with the batch on
the 128-wide lane axis and the merge axis on sublane rows, so every
compare-exchange is a full-width VPU op and nothing round-trips to HBM.

Key layout trick: uint32 candidate ids are sign-flipped into int32
("flipped keys", uint order == int order) outside the kernel, so the
kernel needs only int32 min/max.  SENTINEL (0xFFFFFFFF) flips to INT32_MAX
and naturally sorts last / pads empty output slots.

Bit-identical to vote_candidates (tests/test_vote_pallas.py).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_SENTF = 0x7FFFFFFF   # flipped SENTINEL (python int: jnp
# scalars at module scope would be captured as pallas consts)


def _shift_up(x, k, fill):
    """rows: out[i] = x[i+k] (tail filled)."""
    m = x.shape[0]
    return jnp.concatenate(
        [x[k:], jnp.full((k,) + x.shape[1:], fill, x.dtype)], axis=0)


def _shift_down(x, k, fill):
    """rows: out[i] = x[i-k] (head filled)."""
    return jnp.concatenate(
        [jnp.full((k,) + x.shape[1:], fill, x.dtype), x[:-k]], axis=0)


def _vote_kernel(cand_ref, ids_ref, cnt_ref, scratch_ref, scratch2_ref, *,
                 f2: int, c: int, min_hits: int, out_cap: int):
    m = f2 * c
    y = cand_ref[...]                                   # [m, 128] int32

    # merge tree: F2 ascending C-lists -> fully ascending m rows.  Every
    # compare-exchange stage round-trips through the VMEM scratch ref so
    # Mosaic reuses ONE buffer instead of stacking all ~35 unrolled stage
    # temporaries (which OOMed scoped vmem above 512 rows).
    w = c
    while w < m:
        iota = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
        asc = (iota // (2 * w)) % 2 == 0
        s = w
        while s >= 1:
            zz = y.reshape(m // (2 * s), 2, s, LANES)
            am = asc.reshape(m // (2 * s), 2, s, 1)[:, 0]
            lo = jnp.minimum(zz[:, 0], zz[:, 1])
            hi = jnp.maximum(zz[:, 0], zz[:, 1])
            first = jnp.where(am, lo, hi)
            second = jnp.where(am, hi, lo)
            scratch_ref[...] = jnp.concatenate(
                [first[:, None], second[:, None]], axis=1).reshape(m, LANES)
            y = scratch_ref[...]
            s //= 2
        w *= 2

    # run-length vote (same formulas as vote_candidates)
    iota = jax.lax.broadcasted_iota(jnp.int32, (m, LANES), 0)
    sentf = jnp.int32(_SENTF)
    prev = _shift_down(y, 1, sentf)
    is_start = ((y != prev) | (iota == 0)) & (y != sentf)
    start_pos = jnp.where(is_start | (y == sentf), iota, jnp.int32(m))
    # suffix min of start_pos, then shift to "next boundary after i".
    # Both log-step scans round-trip scratch2 for the same liveness reason
    # as the merge stages.
    sm = start_pos
    k = 1
    while k < m:
        scratch2_ref[...] = jnp.minimum(sm, _shift_up(sm, k, jnp.int32(m)))
        sm = scratch2_ref[...]
        k *= 2
    nxt = _shift_up(sm, 1, jnp.int32(m))
    run_len = nxt - iota

    keep = is_start & (run_len >= min_hits) if min_hits > 1 else is_start
    ki = keep.astype(jnp.int32)
    ps = ki
    k = 1
    while k < m:
        scratch2_ref[...] = ps + _shift_down(ps, k, jnp.int32(0))
        ps = scratch2_ref[...]
        k *= 2
    rank = ps - 1
    num_kept = jnp.max(jnp.where(keep, rank + 1, 0), axis=0)   # [128]

    for slot in range(out_cap):
        mask = keep & (rank == slot)
        ids_ref[slot, :] = jnp.min(jnp.where(mask, y, sentf), axis=0)
        cnt_ref[slot, :] = jnp.max(
            jnp.where(mask, run_len, 0), axis=0)
    cnt_ref[out_cap, :] = num_kept


@partial(jax.jit,
         static_argnames=("min_table_hits", "out_cap", "interpret"))
def vote_candidates_fnc(cand_fnc: jnp.ndarray, min_table_hits: int,
                        out_cap: int, interpret: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused vote over probe output in its NATIVE [F, N, C] layout.

    cand_fnc: [F, N, C] uint32, each (f, n) list ascending, SENTINEL-padded
    (exactly what probe_tables produces before its transpose).  Returns the
    vote_candidates triple: (ids [N, out_cap] uint32, counts [N, out_cap]
    int32, num_kept [N] int32).  Requires C a power of two and N a multiple
    of 128.
    """
    f, n, c = cand_fnc.shape
    assert c & (c - 1) == 0 and c > 0, "probe_cap must be a power of two"
    assert n % LANES == 0, "batch must be a multiple of 128"
    f2 = 1 << (f - 1).bit_length()          # pad tables to a power of two
    m = f2 * c

    flip = jnp.uint32(0x80000000)
    keys = jax.lax.bitcast_convert_type(cand_fnc ^ flip, jnp.int32)
    # [F, N, C] -> [F, C, N] -> [F*C, N]: rows = merge axis, lanes = reads.
    # The kernel's direction-masked merge wants the first level's lists
    # alternately ascending/descending: flip odd tables' lists here (XLA,
    # where rev is cheap; Mosaic cannot lower rev).
    rows3 = keys.transpose(0, 2, 1)                     # [F, C, N]
    odd = (jnp.arange(f, dtype=jnp.int32) % 2 == 1)[:, None, None]
    rows3 = jnp.where(odd, rows3[:, ::-1, :], rows3)
    rows = rows3.reshape(f * c, n)
    if f2 > f:
        rows = jnp.concatenate(
            [rows, jnp.full(((f2 - f) * c, n), jnp.int32(_SENTF))], axis=0)

    tiles = n // LANES
    ids_i, cnt_i = pl.pallas_call(
        partial(_vote_kernel, f2=f2, c=c, min_hits=min_table_hits,
                out_cap=out_cap),
        grid=(tiles,),
        in_specs=[pl.BlockSpec((m, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((out_cap, LANES), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((out_cap + 1, LANES), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((out_cap, n), jnp.int32),
                   jax.ShapeDtypeStruct((out_cap + 1, n), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((m, LANES), jnp.int32),
                        pltpu.VMEM((m, LANES), jnp.int32)],
        interpret=interpret,
    )(rows)

    ids = jax.lax.bitcast_convert_type(ids_i.T, jnp.uint32) ^ flip
    return ids, cnt_i[:out_cap].T, cnt_i[out_cap]
