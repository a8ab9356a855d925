"""Quality scores end-to-end: ingest -> storage -> artifacts -> SAM QUAL.

Reference counterpart: include/qualityscorecompression.hpp (1/2/8-bit
compression) + chunkedreadstorageconstruction.hpp:70-95 (FASTQ ingest).
The reference parses --useQualityScores but always writes '*' to SAM
(mappinghandler.cu:196-293); here the flag turns on real QUAL emission.
"""

import gzip
import random

import numpy as np
import pytest

from hashreadmapper_tpu.config import MapperType, ProgramOptions
from hashreadmapper_tpu.io import fastx
from hashreadmapper_tpu.io.quality import QualityStore
from hashreadmapper_tpu.io.readstore import ReadStorage
from hashreadmapper_tpu.pipeline.driver import run_pipeline


def _random_qual(rng, n):
    return "".join(chr(rng.randint(33, 73)) for _ in range(n))


@pytest.mark.parametrize("bits", [1, 2, 8])
def test_quality_store_array_roundtrip(bits):
    rng = random.Random(1)
    quals = [_random_qual(rng, rng.randint(5, 40)) for _ in range(30)]
    qs = QualityStore(bits)
    for q in quals:
        qs.append(q)
    data, offsets, lengths = qs.to_arrays()
    qs2 = QualityStore.from_arrays(bits, data, offsets, lengths)
    for i in range(len(quals)):
        assert qs2.get(i) == qs.get(i)
        if bits == 8:
            assert qs2.get(i) == quals[i]


def _write_fastq_gz(path, reads, quals):
    with gzip.open(path, "wt") as f:
        for i, (r, q) in enumerate(zip(reads, quals)):
            f.write(f"@r{i}\n{r}\n+\n{q}\n")


@pytest.mark.parametrize("use_native", [True, False])
@pytest.mark.parametrize("bits", [2, 8])
def test_readstore_quality_ingest(tmp_path, use_native, bits):
    rng = random.Random(2)
    reads = ["".join(rng.choice("ACGTN") for _ in range(rng.randint(20, 48)))
             for _ in range(25)]
    quals = [_random_qual(rng, len(r)) for r in reads]
    path = str(tmp_path / "r.fq.gz")
    _write_fastq_gz(path, reads, quals)

    rs = ReadStorage.from_files([path], use_native=use_native,
                                quality_bits=bits)
    assert rs.qualities is not None and rs.qualities.bits == bits
    assert rs.qualities.num_reads == len(reads)
    oracle = QualityStore(bits)
    for q in quals:
        oracle.append(q)
    for i in range(len(reads)):
        assert rs.get_quality_str(i) == oracle.get(i)


def test_readstore_native_python_quality_parity(tmp_path):
    rng = random.Random(3)
    reads = ["".join(rng.choice("ACGT") for _ in range(30))
             for _ in range(10)]
    quals = [_random_qual(rng, 30) for _ in reads]
    path = str(tmp_path / "r.fq.gz")
    _write_fastq_gz(path, reads, quals)
    a = ReadStorage.from_files([path], use_native=True, quality_bits=8)
    b = ReadStorage.from_files([path], use_native=False, quality_bits=8)
    for i in range(len(reads)):
        assert a.get_quality_str(i) == b.get_quality_str(i) == quals[i]


def test_readstore_quality_artifact_roundtrip(tmp_path):
    rng = random.Random(4)
    reads = ["".join(rng.choice("ACGT") for _ in range(24))
             for _ in range(8)]
    quals = [_random_qual(rng, 24) for _ in reads]
    path = str(tmp_path / "r.fq.gz")
    _write_fastq_gz(path, reads, quals)
    rs = ReadStorage.from_files([path], quality_bits=2)
    art = str(tmp_path / "reads.npz")
    rs.save(art)
    rs2 = ReadStorage.load(art)
    assert rs2.qualities is not None and rs2.qualities.bits == 2
    for i in range(len(reads)):
        assert rs2.get_quality_str(i) == rs.get_quality_str(i)
    # no qualities stored -> artifact stays quality-free
    rs3 = ReadStorage.from_files([path])
    art2 = str(tmp_path / "reads2.npz")
    rs3.save(art2)
    assert ReadStorage.load(art2).qualities is None


def _simulate_with_quals(tmp_path, n_reads=40, chrom_len=3000, read_len=60):
    rng = random.Random(7)
    chrom = "".join(rng.choice("ACGT") for _ in range(chrom_len))
    genome_path = tmp_path / "genome.fa"
    with open(genome_path, "w") as fh:
        fh.write(f">chrT\n{chrom}\n")
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    reads, quals = [], []
    for _ in range(n_reads):
        start = rng.randrange(0, chrom_len - read_len)
        seq = chrom[start:start + read_len]
        if rng.random() < 0.5:
            seq = "".join(comp[c] for c in reversed(seq))
        reads.append(seq)
        quals.append(_random_qual(rng, read_len))
    reads_path = str(tmp_path / "reads.fq.gz")
    _write_fastq_gz(reads_path, reads, quals)
    return str(genome_path), reads_path, reads, quals


def test_sam_qual_column(tmp_path):
    genome_path, reads_path, reads, quals = _simulate_with_quals(tmp_path)

    def run(use_quality):
        opts = ProgramOptions(
            genomefile=genome_path, inputfiles=[reads_path],
            outputfile=str(tmp_path / ("outq" if use_quality else "out")),
            kmer_length=16, num_hash_functions=16, window_size=128,
            min_table_hits=4, batchsize=64, max_hamming_percent=0.5,
            probe_cap=64, candidates_per_read_cap=32, max_read_length=64,
            mapper_type=MapperType.SW, use_quality_scores=use_quality)
        return run_pipeline(opts)

    res = run(True)
    rows = [l.split("\t") for l in open(res["sam_path"])
            if not l.startswith("@")]
    n_mapped = n_checked = 0
    for f in rows:
        read_id, flag, seq, qual = int(f[0]), int(f[1]), f[9], f[10]
        if flag & 0x4:
            continue
        n_mapped += 1
        expect = quals[read_id]
        if seq == reads[read_id]:
            assert qual == expect
        else:
            assert qual == expect[::-1]  # SEQ was RC'd; QUAL reversed
        n_checked += 1
    assert n_mapped >= 0.6 * len(reads) and n_checked == n_mapped

    # parity: without the flag the column is '*' (reference behavior)
    res2 = run(False)
    for l in open(res2["sam_path"]):
        if not l.startswith("@"):
            assert l.split("\t")[10] == "*"
