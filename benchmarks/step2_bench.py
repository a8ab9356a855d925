"""STEP-2 (fine alignment) throughput: serial host path vs device path.

Usage: python benchmarks/step2_bench.py [n_reads] [--host] [--device]
Generates a synthetic genome + coarse-mapped reads and times run_cssw
through both backends (plus SAM+VCF write for the end-to-end number).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from hashreadmapper_tpu.config import ProgramOptions
from hashreadmapper_tpu.io.genome import Genome
from hashreadmapper_tpu.io.readstore import ReadStorage, pack_rows
from hashreadmapper_tpu.pipeline import mapping


def make_inputs(n_reads, chrom_len=2_000_000, read_len=100, bs_rate=0.08,
                seed=0):
    rng = np.random.default_rng(seed)
    b2c = np.array(list("ACGT"))
    chrom_bases = rng.integers(0, 4, chrom_len, dtype=np.int8)
    chrom = "".join(b2c[chrom_bases])
    genome = Genome(["chrB"], [chrom])
    genome_rc = genome.reverse_complement()

    starts = rng.integers(0, chrom_len - read_len, n_reads)
    reads = chrom_bases[starts[:, None] + np.arange(read_len)[None, :]].copy()
    conv = (reads == 1) & (rng.random(reads.shape) < bs_rate)
    reads[conv] = 3
    sub = rng.random(reads.shape) < 0.005
    reads[sub] = rng.integers(0, 4, int(sub.sum()))
    rc = rng.random(n_reads) < 0.5
    reads[rc] = 3 - reads[rc][:, ::-1]

    lengths = np.full(n_reads, read_len, np.int32)
    packed = pack_rows(reads, lengths, (read_len + 15) // 16)
    store = ReadStorage(packed, lengths, np.zeros(n_reads, bool))

    stride = 128 - 16 + 1
    wpos = (starts // stride) * stride
    orientation = np.where(rc, mapping.REVERSE_COMPLEMENT,
                           mapping.FORWARD).astype(np.int8)
    junk = rng.random(n_reads) < 0.03
    orientation[junk] = mapping.NONE
    position = wpos.astype(np.int64)
    chromosome_id = np.zeros(n_reads, np.int32)
    return genome, genome_rc, orientation, position, chromosome_id, store


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    which = [a for a in sys.argv[2:]] or ["--device", "--host"]
    opts = ProgramOptions(window_size=128, threads=4, max_read_length=128)
    genome, genome_rc, ori, pos, chrom, store = make_inputs(n)

    if "--device" in which:
        t0 = time.perf_counter()
        out_d = mapping._run_cssw_device(genome, genome_rc, ori, pos, chrom,
                                         store, opts)
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        out_d = mapping._run_cssw_device(genome, genome_rc, ori, pos, chrom,
                                         store, opts)
        dt = time.perf_counter() - t0
        print(f"device: {n} reads, first {t_first:.2f}s (incl compile), "
              f"steady {dt:.2f}s -> {n/dt:,.0f} reads/s")
        t0 = time.perf_counter()
        mapping.print_to_sam(out_d, genome, "/tmp/step2_bench.sam")
        mapping.do_vc(out_d, genome, "/tmp/step2_bench")
        print(f"  SAM+VCF write: {time.perf_counter()-t0:.2f}s")

    if "--host" in which:
        t0 = time.perf_counter()
        out_h = mapping._run_cssw_host(genome, genome_rc, ori, pos, chrom,
                                       store, opts)
        dt = time.perf_counter() - t0
        print(f"host:   {n} reads, {dt:.2f}s -> {n/dt:,.0f} reads/s")


if __name__ == "__main__":
    main()
