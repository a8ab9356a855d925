"""Full-pipeline E2E: simulated BS-seq reads -> coarse map -> SAM -> VCF."""

import random

import numpy as np
import pytest

from hashreadmapper_tpu.config import MapperType, ProgramOptions
from hashreadmapper_tpu.io import fastx
from hashreadmapper_tpu.io.genome import Genome
from hashreadmapper_tpu.io.readstore import ReadStorage
from hashreadmapper_tpu.pipeline.driver import run_pipeline


def _simulate(tmp_path, n_reads=60, chrom_len=3000, read_len=60,
              bs_rate=0.1, snp_positions=()):
    rng = random.Random(5)
    chrom = "".join(rng.choice("ACGT") for _ in range(chrom_len))
    genome_path = tmp_path / "genome.fa"
    with open(genome_path, "w") as fh:
        fh.write(f">chrT\n{chrom}\n")

    reads = []
    truth = []
    for i in range(n_reads):
        start = rng.randrange(0, chrom_len - read_len)
        seq = list(chrom[start:start + read_len])
        for p in snp_positions:
            if start <= p < start + read_len:
                seq[p - start] = "A" if chrom[p] != "A" else "G"
        # bisulfite: unmethylated C -> T with bs_rate
        seq = ["T" if (c == "C" and rng.random() < bs_rate) else c
               for c in seq]
        rc = rng.random() < 0.5
        if rc:
            comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
            seq = [comp[c] for c in reversed(seq)]
        reads.append("".join(seq))
        truth.append((start, rc))
    reads_path = tmp_path / "reads.fq"
    fastx.write_fastq(str(reads_path), [
        fastx.SequenceRecord(f"r{i}", "", s) for i, s in enumerate(reads)])
    return str(genome_path), str(reads_path), truth, chrom


def test_pipeline_end_to_end(tmp_path):
    genome_path, reads_path, truth, chrom = _simulate(tmp_path)
    opts = ProgramOptions(
        genomefile=genome_path, inputfiles=[reads_path],
        outputfile=str(tmp_path / "out"),
        kmer_length=16, num_hash_functions=16, window_size=128,
        min_table_hits=4, batchsize=64, max_hamming_percent=0.5,
        probe_cap=64, candidates_per_read_cap=32, max_read_length=64,
        mapper_type=MapperType.SW)
    res = run_pipeline(opts)

    results = res["results"]
    n_mapped = int((results.orientation != 3).sum())
    # parity mode seeds on raw kmers (the reference's 3N seeding is commented
    # out, hammingdistancekernels.cu:204), so only lightly-converted reads
    # seed; at 10% conversion most reads retain shared minhash kmers
    assert n_mapped >= len(truth) * 0.3, n_mapped

    stride = opts.window_stride
    correct = 0
    for i, (start, rc) in enumerate(truth):
        if results.orientation[i] == 3:
            continue
        # coarse position is a window start; the true start must fall inside
        # [pos - readlen, pos + window)
        pos = results.position[i]
        if pos - 64 <= start < pos + opts.window_size:
            correct += 1
    assert correct >= n_mapped * 0.9, (correct, n_mapped)

    sam = open(res["sam_path"]).read()
    lines = sam.splitlines()
    assert lines[0] == "@HD\tVN:1.4"
    body = [l for l in lines if not l.startswith("@")]
    assert len(body) == len(truth)
    # check one mapped row's shape
    mapped_rows = [l for l in body if "Yf:i:<" in l]
    assert len(mapped_rows) == n_mapped
    f = mapped_rows[0].split("\t")
    assert f[2] == "chrT"
    assert f[10] == "*"
    assert "YZ:A:<" in f[11]

    vcf = open(res["vcf_path"]).read()
    assert vcf.startswith("##fileformat=VCFv4.2\n")


def test_pipeline_maps_clean_reads_exactly(tmp_path):
    # without BS conversion, nearly every read must coarse-map and the SAM
    # POS must reconstruct the true start: pos = window.position + query_begin
    genome_path, reads_path, truth, chrom = _simulate(
        tmp_path, n_reads=40, bs_rate=0.0)
    opts = ProgramOptions(
        genomefile=genome_path, inputfiles=[reads_path],
        outputfile=str(tmp_path / "out"),
        kmer_length=16, num_hash_functions=16, window_size=128,
        min_table_hits=4, batchsize=64, max_hamming_percent=0.1,
        probe_cap=64, candidates_per_read_cap=32, max_read_length=64,
        mapper_type=MapperType.SW)
    res = run_pipeline(opts)
    results = res["results"]
    n_mapped = int((results.orientation != 3).sum())
    assert n_mapped >= len(truth) * 0.9

    # SHD shift must locate the true start exactly for mapped fwd reads
    ok = 0
    for i, (start, rc) in enumerate(truth):
        if results.orientation[i] == 3:
            continue
        got_start = results.position[i] + results.shift[i]
        if got_start == start:
            ok += 1
    assert ok == n_mapped, (ok, n_mapped)
