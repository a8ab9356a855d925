"""Benchmark: coarse BS-read mapping throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "reads/s", "vs_baseline": R}

Baseline provenance: the reference publishes no numbers (BASELINE.md).  The
documented estimate is its production SLURM shape — 10M reads / 6 GPUs within
a 20-minute walltime request (reference: scriptJob:10-17,40) — i.e. >=8333
reads/s aggregate, ~1389 reads/s per GPU.  vs_baseline = value / 1389.

The workload mirrors the mapper's steady state: synthetic 8 Mbp genome,
window index resident in HBM, 100 bp reads (50% RC, 1% substitutions, 10%
junk) streamed through the jitted map step (signatures -> CSR probe -> vote
-> SHD -> per-read best).
"""

import json
import sys
import time

import numpy as np

REFERENCE_READS_PER_SEC_PER_CHIP = 1389.0


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from hashreadmapper_tpu.config import ProgramOptions
    from hashreadmapper_tpu.io.genome import Genome
    from hashreadmapper_tpu.pipeline.engine import CoarseMapper

    dev = jax.devices()[0]
    log(f"device: {dev}")

    rng = np.random.default_rng(0)
    genome_len = 8_000_000
    read_len = 100
    batch = 2048
    n_batches = 24

    chrom_bases = rng.integers(0, 4, size=genome_len, dtype=np.int8)
    chrom = "".join(np.array(list("ACGT"))[chrom_bases])
    genome = Genome(["chrB"], [chrom])

    opts = ProgramOptions(
        kmer_length=16, num_hash_functions=16, window_size=128,
        min_table_hits=4, batchsize=batch, max_hamming_percent=0.05,
        probe_cap=16, candidates_per_read_cap=8, max_read_length=128)

    t0 = time.perf_counter()
    mapper = CoarseMapper(genome, opts)
    log(f"index build: {time.perf_counter()-t0:.2f}s, "
        f"{mapper.index.memory_bytes()/1e6:.1f} MB, "
        f"{mapper.table.num_windows} windows")

    # reads: planted with 1% substitutions, 50% RC, 10% junk
    n_reads = batch * n_batches
    starts = rng.integers(0, genome_len - read_len, size=n_reads)
    reads = chrom_bases[starts[:, None] + np.arange(read_len)[None, :]].copy()
    sub = rng.random(reads.shape) < 0.01
    reads[sub] = rng.integers(0, 4, size=int(sub.sum()))
    rc = rng.random(n_reads) < 0.5
    reads[rc] = 3 - reads[rc][:, ::-1]
    junk = rng.random(n_reads) < 0.10
    reads[junk] = rng.integers(0, 4, size=(int(junk.sum()), read_len),
                               dtype=np.int8)
    reads = np.pad(reads, ((0, 0), (0, opts.max_read_length - read_len)))
    lengths = np.full(n_reads, read_len, dtype=np.int32)

    f = opts.num_hash_functions
    dropped = (jnp.full((f, 1), jnp.uint32(0xFFFFFFFF), dtype=jnp.uint32),
               jnp.zeros((f,), dtype=jnp.int32))

    # reads live on device; batches are sliced in-jit (no per-batch H2D)
    all_bases = jnp.asarray(reads)
    all_lens = jnp.asarray(lengths)
    all_valid = jnp.ones((n_reads,), dtype=bool)
    jax.block_until_ready([all_bases, all_lens, all_valid])

    def run_batch(i):
        return mapper._map_batch_at(
            all_bases, all_lens, all_valid, jnp.int32(i * batch), batch,
            dropped[0], dropped[1])

    # warmup / compile
    t0 = time.perf_counter()
    out = run_batch(0)
    jax.block_until_ready(out)
    log(f"compile+first batch: {time.perf_counter()-t0:.2f}s")

    t0 = time.perf_counter()
    outs = [out]
    for i in range(1, n_batches):
        outs.append(run_batch(i))
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    n_done = batch * (n_batches - 1)
    rps = n_done / dt

    import jax.numpy as jnp2
    all_packed = np.asarray(jnp2.concatenate([o[0] for o in outs], axis=0))
    n_mapped = int((all_packed[:, 0] != 3).sum())
    log(f"{n_done} reads in {dt:.3f}s -> {rps:,.0f} reads/s; "
        f"mapped {n_mapped}/{n_reads}")

    print(json.dumps({
        "metric": "bs_reads_coarse_mapped_per_sec_per_chip",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / REFERENCE_READS_PER_SEC_PER_CHIP, 2),
    }))


if __name__ == "__main__":
    main()
