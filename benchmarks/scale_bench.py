"""Scale benchmark: chr1-class synthetic genome on one chip.

Usage: python benchmarks/scale_bench.py [genome_mbp] [n_batches] [3n|parity]
Prints index-build time, steady mapping throughput, and accuracy of planted
reads (exact coarse positions).  Default mode is 3N (bisulfite, 90% C->T,
50% RC) — the production configuration; wall-clock timing is honest
(map_reads returns host arrays).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from hashreadmapper_tpu.config import ProgramOptions
    from hashreadmapper_tpu.io.genome import Genome
    from hashreadmapper_tpu.pipeline.engine import CoarseMapper

    genome_mbp = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    three_n = (sys.argv[3] if len(sys.argv) > 3 else "3n") == "3n"
    # optional cap overrides: probe_cap, candidates_per_read_cap, budgets
    probe_cap = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    kcap = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    budget = int(sys.argv[6]) if len(sys.argv) > 6 else 4
    g_len = genome_mbp * 1_000_000
    read_len = 100
    batch = 2048

    rng = np.random.default_rng(7)
    t0 = time.time()
    chrom_bases = rng.integers(0, 4, size=g_len, dtype=np.int8)
    chrom = (np.frombuffer(b"ACGT", dtype=np.uint8)[
        chrom_bases.astype(np.uint8)]).tobytes().decode("ascii")
    print(f"synth genome ({genome_mbp} Mbp): {time.time()-t0:.1f}s",
          flush=True)
    genome = Genome([f"chr{genome_mbp}M"], [chrom])

    opts = ProgramOptions(
        kmer_length=16, num_hash_functions=16, window_size=128,
        min_table_hits=4, batchsize=batch, max_hamming_percent=0.05,
        probe_cap=probe_cap, candidates_per_read_cap=kcap,
        max_read_length=128, three_n_seeding=three_n,
        shd_pairs_per_read_budget=budget, probe_tail_budget_per_read=budget)
    print(f"mode: {'3N' if three_n else 'parity'}; caps "
          f"{probe_cap}/{kcap}/{budget}", flush=True)
    t0 = time.time()
    mapper = CoarseMapper(genome, opts)
    print(f"index build: {time.time()-t0:.1f}s, "
          f"{mapper.table.num_windows} windows, "
          f"{mapper.index.memory_bytes()/1e6:.0f} MB", flush=True)

    n_reads = batch * n_batches
    starts = rng.integers(0, g_len - read_len, size=n_reads)
    reads = chrom_bases[starts[:, None] + np.arange(read_len)[None, :]].copy()
    rc = rng.random(n_reads) < 0.5
    reads[rc] = 3 - reads[rc][:, ::-1]
    if three_n:
        conv = (reads == 1) & (rng.random(reads.shape) < 0.9)
        reads[conv] = 3
    reads = np.pad(reads, ((0, 0), (0, 28))).astype(np.int8)
    lens = np.full(n_reads, read_len, dtype=np.int32)

    t0 = time.time()
    res = mapper.map_reads(reads, lens, emulate_read_key_drop=False)
    print(f"map(first, incl compile): {n_reads/(time.time()-t0):,.0f} reads/s",
          flush=True)
    t0 = time.time()
    res = mapper.map_reads(reads, lens, emulate_read_key_drop=False)
    dt = time.time() - t0
    m = res.orientation != 3
    ok = int((res.position[m] + res.shift[m] == starts[m]).sum())
    print(f"map(steady): {n_reads/dt:,.0f} reads/s; mapped {int(m.sum())} "
          f"({100*m.mean():.1f}%), exact-position {ok}/{int(m.sum())}; "
          f"stats {res.stats}", flush=True)


if __name__ == "__main__":
    main()
