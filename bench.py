"""Benchmark: BS-read mapping throughput on one TPU chip (3N configuration).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "reads/s", "vs_baseline": R, ...}

The flagship metric is the 3N (bisulfite) configuration on 90%-converted
reads — the project's actual workload (reference README.md:1 "3N hash based
readmapper for C->T BS conversion") — measured over the jitted coarse map
step (signatures -> CSR probe -> vote -> SHD -> per-read best) with the
read pool device-resident.  Extra keys report the end-to-end rate
(coarse + STEP-2 fine alignment/SAM + STEP-3 VCF, reference phase timers
src/gpu/main_gpu.cu:1147-1154) and the parity-mode coarse rate.

Baseline provenance: the reference publishes no numbers (BASELINE.md).  The
documented estimate is its production SLURM shape — 10M reads / 6 GPUs
within a 20-minute walltime request (reference: scriptJob:10-17,40) — i.e.
>=8333 reads/s aggregate, ~1389 reads/s per GPU (an ESTIMATE, not a
measurement).  vs_baseline = value / 1389.

ROUND-4 METHODOLOGY CORRECTION: jax.block_until_ready does not wait for
execution on this transport, so the coarse numbers reported by rounds 1-3
(BENCH_r01..r03) timed little more than dispatch and are inflated; see
coarse_rate's docstring for the honest protocol (time through the single
result fetch; medians of >=3 reps).  The e2e wall-clock numbers were
always honest.
"""

import json
import sys
import time

import numpy as np

REFERENCE_READS_PER_SEC_PER_CHIP = 1389.0


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def make_genome_and_reads(rng, genome_len, n_reads, read_len, three_n):
    from hashreadmapper_tpu.io.genome import Genome

    chrom_bases = rng.integers(0, 4, size=genome_len, dtype=np.int8)
    chrom = "".join(np.array(list("ACGT"))[chrom_bases])
    genome = Genome(["chrB"], [chrom])

    starts = rng.integers(0, genome_len - read_len, size=n_reads)
    reads = chrom_bases[starts[:, None] + np.arange(read_len)[None, :]].copy()
    sub = rng.random(reads.shape) < 0.01
    reads[sub] = rng.integers(0, 4, size=int(sub.sum()))
    rc = rng.random(n_reads) < 0.5
    reads[rc] = 3 - reads[rc][:, ::-1]
    if three_n:
        # bisulfite converts the sequenced strand: 90% of Cs read as T,
        # applied in READ space (after any reverse-complement)
        conv = (reads == 1) & (rng.random(reads.shape) < 0.9)
        reads[conv] = 3
    junk = rng.random(n_reads) < 0.10
    reads[junk] = rng.integers(0, 4, size=(int(junk.sum()), read_len),
                               dtype=np.int8)
    return genome, reads, starts


def coarse_rate(genome, reads, opts, label, reps=3):
    """Steady-state coarse rate over the device-resident read pool.

    MEASUREMENT METHODOLOGY (round 4): on this transport
    jax.block_until_ready returns BEFORE execution completes (verified:
    24-batch dispatch "blocked" in 0.37 s while fetching the results took
    another 1.2 s), so rounds 1-3's coarse numbers timed only dispatch.
    The honest protocol used here: dispatch every batch, concatenate the
    per-batch outputs ON DEVICE, and time through the single host fetch
    (np.asarray), which waits for the whole FIFO.  The reported value is
    the median of `reps` repetitions; per-rep rates go to stderr so the
    run-to-run spread stays visible.
    """
    import jax
    import jax.numpy as jnp

    from hashreadmapper_tpu.pipeline.engine import CoarseMapper

    n_reads, read_len = reads.shape
    batch = opts.batchsize
    n_batches = n_reads // batch

    t0 = time.perf_counter()
    mapper = CoarseMapper(genome, opts)
    log(f"[{label}] index build: {time.perf_counter()-t0:.2f}s, "
        f"{mapper.index.memory_bytes()/1e6:.1f} MB, "
        f"{mapper.table.num_windows} windows")

    f = opts.num_hash_functions * (2 if opts.three_n_seeding else 1)
    dropped = (jnp.full((f, 1), jnp.uint32(0xFFFFFFFF), dtype=jnp.uint32),
               jnp.zeros((f,), dtype=jnp.int32))
    padded = np.pad(reads, ((0, 0), (0, opts.max_read_length - read_len)))
    all_bases = jnp.asarray(padded)
    all_lens = jnp.asarray(np.full(n_reads, read_len, dtype=np.int32))
    all_valid = jnp.ones((n_reads,), dtype=bool)
    np.asarray(all_bases)   # force the upload to finish before timing

    mapper.dropped = dropped

    def run_all():
        # ONE dispatch (lax.scan over the pool, engine.map_pool_scanned;
        # per-batch dispatch overhead removed) and ONE fetch that waits
        # for the whole FIFO + the transfer
        packed_dev, ovf_dev = mapper.map_pool_scanned(
            all_bases, all_lens, all_valid, n_batches * batch, batch)
        return np.asarray(packed_dev), np.asarray(ovf_dev)

    t0 = time.perf_counter()
    packed, ovf = run_all()
    log(f"[{label}] compile+first pass: {time.perf_counter()-t0:.2f}s")

    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        packed, ovf = run_all()
        dt = time.perf_counter() - t0
        rates.append(n_reads / dt)
    rps = float(np.median(rates))

    assert ovf[2] == 0, f"pair budget overflowed ({ovf[2]} dropped pairs)"
    assert ovf[3] == 0, f"probe tail budget overflowed ({ovf[3]} probes)"
    if len(ovf) > 4:
        assert ovf[4] == 0, f"probe head budget overflowed ({ovf[4]} probes)"
    n_mapped = int((packed[:, 0] != 3).sum())
    log(f"[{label}] {n_reads} reads x{reps}: "
        f"{'/'.join(f'{r:,.0f}' for r in rates)} reads/s (median {rps:,.0f})"
        f"; mapped {n_mapped}/{n_reads}; overflow {ovf.tolist()}")
    return rps, mapper, packed, n_reads / rps, ovf


def main():
    """Stage-contained bench: EVERY stage is wrapped, and exactly ONE JSON
    line always reaches stdout (rc 0) — with an "error" key listing any
    failed stages and the keys of every stage that succeeded.  Round 4
    lost its entire official result to one kernel that failed to lower
    (BENCH_r04 was rc=1 with a Mosaic dump and zero JSON lines); the
    coarse stage had already succeeded in that very run and a contained
    bench would have reported it (VERDICT r4 #2)."""
    import traceback

    result = {
        "metric": "bs_reads_coarse_mapped_per_sec_per_chip",
        "value": 0.0,
        "unit": "reads/s",
        "vs_baseline": 0.0,
    }
    errors = []

    def stage(name, fn):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - containment by design
            traceback.print_exc(file=sys.stderr)
            errors.append(f"{name}: {type(e).__name__}: {e}")
            return None

    stage("all", lambda: _run_stages(result, stage))
    if errors:
        result["error"] = "; ".join(errors)
    print(json.dumps(result))


def _run_stages(result, stage):
    import jax

    from hashreadmapper_tpu.config import ProgramOptions
    from hashreadmapper_tpu.io.readstore import ReadStorage, pack_rows
    from hashreadmapper_tpu.ops import swdev
    from hashreadmapper_tpu.pipeline import mapping

    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    genome_len = 8_000_000
    read_len = 100
    # batch 4096 (vs the CLI-default 2048): fewer dispatches amortize the
    # per-dispatch overhead on this transport; results are per-read
    # identical (budgets scale with the batch)
    batch = 4096
    n_reads = batch * 12

    def opts_for(three_n, probe_cap=16):
        return ProgramOptions(
            kmer_length=16, num_hash_functions=16, window_size=128,
            min_table_hits=4, batchsize=batch, max_hamming_percent=0.05,
            probe_cap=probe_cap, candidates_per_read_cap=8,
            max_read_length=128,
            threads=4, three_n_seeding=three_n,
            # compaction/two-tier knobs: bit-identical while the
            # pair_budget/probe_tail overflow counters stay 0 (asserted
            # in coarse_rate)
            shd_pairs_per_read_budget=4,
            probe_tail_budget_per_read=4,
            # found-compacted head gather (bit-identical; asserted via the
            # probe_head overflow counter; ~43% found rate measured, 2F=32
            # is the per-read ceiling)
            probe_head_budget_per_read=18)

    # --- flagship: 3N configuration on 90%-converted BS reads ---
    genome, reads, _ = make_genome_and_reads(
        rng, genome_len, n_reads, read_len, three_n=True)
    opts3 = opts_for(True)
    flagship = stage("coarse3n", lambda: coarse_rate(genome, reads, opts3,
                                                     "3N"))
    if flagship is None:
        mapper = packed = None
    else:
        rps_3n, mapper, packed, t_coarse, ovf3 = flagship
        result["value"] = round(rps_3n, 1)
        result["vs_baseline"] = round(
            rps_3n / REFERENCE_READS_PER_SEC_PER_CHIP, 2)
        # probe-overflow honesty (VERDICT r4 weak #6): the flagship cap
        # config drops probe hits past probe_cap=16; report the count and
        # the mapped-rate delta vs an overflow-free cap below
        result["probe_overflow_3n"] = int(ovf3[0])

    def e2e():
        # --- end-to-end: the pipelined driver path (chunked coarse +
        # STEP 2 overlap, pipeline/driver.py::_pipelined_sw) -> SAM ->
        # VCF, measured wall-clock over all reads (reference "process
        # mapping"/"process variant calling" phases,
        # main_gpu.cu:1147-1154) ---
        from hashreadmapper_tpu.pipeline.driver import _pipelined_sw

        genome_rc = genome.reverse_complement()
        lengths = np.full(n_reads, read_len, np.int32)
        n_mapped_3n = int((packed[:, 0] != 3).sum())
        store = ReadStorage(
            pack_rows(reads, lengths, (read_len + 15) // 16),
            lengths, np.zeros(n_reads, bool))
        opts3.step2_pipeline_chunk = 8192
        padded = np.pad(
            reads, ((0, 0), (0, opts3.max_read_length - read_len))
        ).astype(np.int8)
        # warm the STEP-2 kernels at the FULL read-pool shape: the
        # streaming path's staged pool is an argument shape, so an
        # 8192-read warm pass leaves every full-size kernel cold and rep 0
        # pays the compiles (observed: 11.3 s rep 0 vs 1.7 s rep 1)
        _pipelined_sw(mapper, padded, store, genome, genome_rc, opts3)
        from hashreadmapper_tpu.pipeline.records import (MappingRecords,
                                                         emit_sam, emit_vcf)
        import gc
        e2e_rates = []
        for rep in range(3):        # median of 3 (run variance, PERF.md;
            # rep i+1 contends with rep i's buffer cleanup — collect first)
            gc.collect()
            t0 = time.perf_counter()
            results3, aas = _pipelined_sw(mapper, padded, store, genome,
                                          genome_rc, opts3)
            t_map = time.perf_counter() - t0
            if isinstance(aas, MappingRecords):
                sam_stats = emit_sam(aas, genome, "/tmp/bench_out.SAM",
                                     threads=4)
                t_sam = time.perf_counter() - t0
                emit_vcf(aas, genome, "/tmp/bench_out")
            else:
                sam_stats = mapping.print_to_sam(aas, genome,
                                                 "/tmp/bench_out.SAM")
                t_sam = time.perf_counter() - t0
                mapping.do_vc(aas, genome, "/tmp/bench_out")
            t_e2e = time.perf_counter() - t0
            log(f"[e2e] rep {rep}: map {t_map:.2f}s "
                f"sam +{t_sam - t_map:.2f}s vcf +{t_e2e - t_sam:.2f}s")
            e2e_rates.append(n_reads / t_e2e)
        rps_e2e = float(np.median(e2e_rates))
        log(f"[e2e] pipelined STEP1+2+3 ({sam_stats}); "
            f"{'/'.join(f'{r:,.0f}' for r in e2e_rates)} -> "
            f"e2e {rps_e2e:,.0f} reads/s")
        n3 = int((results3.orientation != 3).sum())
        assert n3 == n_mapped_3n, "pipelined coarse diverged from pool"
        result["e2e_sam_vcf_reads_per_sec"] = round(rps_e2e, 1)

    if mapper is not None:
        stage("e2e", e2e)
        # the striped-SW backend decision was forced by the e2e pass;
        # record which pass the headline actually used
        result["sw_kernel_fallback"] = swdev.sw_pallas_state()["fallback"]

    def overflow_free_delta():
        # mapped-rate delta vs an overflow-free probe cap (VERDICT r4
        # weak #6): same reads, probe_cap high enough that nothing is
        # dropped (reference maxResultsPerMap=65535 drops nothing at this
        # genome's repeat structure either, options.hpp:36).  Only the
        # mapped fraction matters here, not the rate.
        opts_full = opts_for(True, probe_cap=128)
        rps_f, _m, packed_f, _t, ovf_f = coarse_rate(
            genome, reads, opts_full, "3N-nofull", reps=1)
        assert ovf_f[0] == 0, (
            f"probe_cap=128 still overflows ({int(ovf_f[0])})")
        mapped_cap = int((packed[:, 0] != 3).sum())
        mapped_full = int((packed_f[:, 0] != 3).sum())
        agree = float(np.mean(
            (packed[:, 0] == packed_f[:, 0])
            & ((packed[:, 4] == packed_f[:, 4]) | (packed_f[:, 0] == 3))))
        log(f"[overflow] mapped cap16 {mapped_cap} vs overflow-free "
            f"{mapped_full} ({mapped_cap - mapped_full:+d}); "
            f"agreement {agree:.4f}")
        result["mapped_delta_vs_overflow_free"] = mapped_cap - mapped_full
        result["mapped_rate_overflow_free"] = round(
            mapped_full / n_reads, 4)

    if packed is not None:
        stage("overflow_free", overflow_free_delta)

    def parity():
        # --- parity-mode coarse rate (the round-1 configuration) ---
        genome_p, reads_p, _ = make_genome_and_reads(
            rng, genome_len, n_reads, read_len, three_n=False)
        rps_parity, _, _, _, _ = coarse_rate(
            genome_p, reads_p, opts_for(False), "parity")
        result["parity_coarse_reads_per_sec"] = round(rps_parity, 1)

    stage("parity", parity)


if __name__ == "__main__":
    main()
