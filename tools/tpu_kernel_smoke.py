"""On-hardware Pallas kernel smoke gate.

Run this BEFORE every bench / release on the real chip:

    timeout 1200 python tools/tpu_kernel_smoke.py

Interpret-mode tests validate kernel *semantics* but not Mosaic
*lowering* — a kernel that traces fine can still fail to legalize on the
real compiler (round 4 shipped exactly such a kernel, zeroing the round's
bench).  This script compiles and runs every production Pallas kernel on
the actual device at production shapes, asserts bit-exactness against the
XLA formulations, and exits non-zero on any failure.

Stages:
  1. striped-SW backend decision (tiny-shape compile + bit-check,
     ops/swdev.decide_sw_backend) — must select the Pallas kernel.
  2. striped-SW at the production STEP-2 shape (lq=128 -> S=8,
     n_cols=window_size): Pallas vs XLA scan, all ten packed rows exact.
  3. miniature end-to-end coarse+scored mapping (CoarseMapper with
     step2_device on): exercises the minhash, vote, SHD and banded-
     traceback kernels in their real call paths; asserts the fallback
     stats are all zero and budgets did not overflow.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    log(f"backend: {backend}; device: {jax.devices()[0]}")
    if backend == "cpu":
        log("FAIL: smoke gate must run on the real chip (backend is cpu)")
        return 2

    from hashreadmapper_tpu.ops import swdev

    # --- stage 1: backend decision --------------------------------------
    t0 = time.perf_counter()
    ok = swdev.decide_sw_backend(force=True)
    st = swdev.sw_pallas_state()
    log(f"[1] decide_sw_backend -> {ok} ({time.perf_counter()-t0:.1f}s) "
        f"state={st}")
    if not ok:
        log("FAIL: striped-SW Pallas kernel did not pass the on-device "
            "smoke decision (see warning above)")
        return 1

    # --- stage 2: production-shape striped SW, Pallas vs XLA exact ------
    rng = np.random.default_rng(7)
    P, lq, n_cols = 256, 128, 128
    rc = rng.integers(0, 4, size=(P, lq)).astype(np.int8)
    rl = rng.integers(64, lq + 1, size=P).astype(np.int32)
    fc = rng.integers(0, 5, size=(P, n_cols)).astype(np.int8)
    fl = rng.integers(100, n_cols + 1, size=P).astype(np.int32)
    ml = np.maximum(15, rl // 2).astype(np.int32)

    def run_packed():
        out = np.asarray(swdev.ssw_score_packed(
            jnp.asarray(rc), jnp.asarray(rl), jnp.asarray(fc),
            jnp.asarray(fl), jnp.asarray(ml), n_cols))
        return out

    t0 = time.perf_counter()
    got = run_packed()
    log(f"[2] pallas packed10 compiled+ran ({time.perf_counter()-t0:.1f}s)")
    swdev._SW_PALLAS["ok"] = False
    jax.clear_caches()
    try:
        t0 = time.perf_counter()
        want = run_packed()
        log(f"[2] XLA packed10 ran ({time.perf_counter()-t0:.1f}s)")
    finally:
        swdev._SW_PALLAS["ok"] = True
        jax.clear_caches()
    if not np.array_equal(got, want):
        bad = np.argwhere(got != want)
        log(f"FAIL: pallas vs XLA mismatch at {bad[:5].tolist()} "
            f"({len(bad)} cells)")
        return 1
    log(f"[2] bit-exact at production shape (P={P}, lq={lq}, "
        f"n_cols={n_cols})")

    # --- stage 3: mini e2e with every kernel in its real call path ------
    from hashreadmapper_tpu.config import ProgramOptions
    from hashreadmapper_tpu.io.genome import Genome
    from hashreadmapper_tpu.pipeline.engine import CoarseMapper

    batch = 1024
    n_reads = batch * 2
    read_len, glen = 100, 1_000_000
    gb = rng.integers(0, 4, size=glen, dtype=np.int8)
    genome = Genome(["chrS"], ["".join(np.array(list("ACGT"))[gb])])
    starts = rng.integers(0, glen - read_len, size=n_reads)
    reads = gb[starts[:, None] + np.arange(read_len)[None, :]].copy()
    conv = (reads == 1) & (rng.random(reads.shape) < 0.9)
    reads[conv] = 3
    opts = ProgramOptions(
        kmer_length=16, num_hash_functions=16, window_size=128,
        min_table_hits=4, batchsize=batch, max_hamming_percent=0.05,
        probe_cap=16, candidates_per_read_cap=8, max_read_length=128,
        threads=2, three_n_seeding=True, shd_pairs_per_read_budget=4,
        probe_tail_budget_per_read=4, probe_head_budget_per_read=18)
    t0 = time.perf_counter()
    mapper = CoarseMapper(genome, opts)
    res, _scores = mapper.map_reads(
        reads, np.full(n_reads, read_len, np.int32), with_scores=True)
    log(f"[3] mini e2e built+mapped in {time.perf_counter()-t0:.1f}s; "
        f"stats={res.stats}")
    n_mapped = int((res.orientation != 3).sum())
    failures = []
    if n_mapped < n_reads * 0.9:
        failures.append(f"mapped only {n_mapped}/{n_reads}")
    for key in ("vote_kernel_fallback", "sw_kernel_fallback"):
        if res.stats.get(key, 0):
            failures.append(f"{key}={res.stats[key]}")
    for key in ("pair_budget_overflow", "probe_tail_overflow",
                "probe_head_overflow"):
        if res.stats.get(key, 0):
            failures.append(f"{key}={res.stats[key]}")
    if failures:
        log("FAIL: " + "; ".join(failures))
        return 1
    log("SMOKE OK: all Pallas kernels lower, run, and are bit-exact; "
        "no fallbacks")
    return 0


if __name__ == "__main__":
    sys.exit(main())
