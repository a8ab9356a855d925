"""Edit-distance aligner vs frozen reference-edlib goldens + edlib SAM mode."""

import os
import re

from hashreadmapper_tpu.align.edit import myers_nw_distance, nw_align

HERE = os.path.dirname(__file__)


def _cases():
    out = []
    with open(os.path.join(HERE, "golden", "edlib_golden.txt")) as fh:
        for line in fh:
            if line.startswith("#") or not line.strip():
                continue
            left, want = line.rsplit("|", 1)
            q, t = left.split()
            out.append((q, t, int(want)))
    return out


def test_myers_matches_reference_edlib():
    for q, t, want in _cases():
        assert myers_nw_distance(q, t) == want, (q, t)


def test_nw_align_distance_and_cigar_consistency():
    for q, t, want in _cases()[:60]:
        dist, cig = nw_align(q, t)
        assert dist == want
        qc = sum(int(n) for n, op in re.findall(r"(\d+)([MID])", cig)
                 if op in "MI")
        tc = sum(int(n) for n, op in re.findall(r"(\d+)([MID])", cig)
                 if op in "MD")
        assert qc == len(q) and tc == len(t)


def test_edlib_pipeline_mode(tmp_path):
    import random
    from hashreadmapper_tpu.config import MapperType, ProgramOptions
    from hashreadmapper_tpu.io import fastx
    from hashreadmapper_tpu.pipeline.driver import run_pipeline

    rng = random.Random(9)
    chrom = "".join(rng.choice("ACGT") for _ in range(2000))
    genome_path = tmp_path / "g.fa"
    with open(genome_path, "w") as fh:
        fh.write(f">chrE\n{chrom}\n")
    reads = []
    for i in range(20):
        s = rng.randrange(0, 1900)
        reads.append(fastx.SequenceRecord(f"r{i}", "", chrom[s:s + 80]))
    reads_path = tmp_path / "r.fq"
    fastx.write_fastq(str(reads_path), reads)

    opts = ProgramOptions(
        genomefile=str(genome_path), inputfiles=[str(reads_path)],
        outputfile=str(tmp_path / "out"), kmer_length=16,
        num_hash_functions=16, window_size=128, min_table_hits=4,
        batchsize=32, max_hamming_percent=0.1, probe_cap=32,
        candidates_per_read_cap=16, max_read_length=96,
        mapper_type=MapperType.EDLIB)
    res = run_pipeline(opts)
    sam = open(res["sam_path"]).read()
    body = [l for l in sam.splitlines() if not l.startswith("@")]
    assert len(body) == 20
    mapped = [l for l in body if "Yf:i:<" in l]
    assert len(mapped) >= 15
    # clean reads: edit distance 0 -> pure-match CIGAR over the window
    f = mapped[0].split("\t")
    assert re.fullmatch(r"(\d+[MID])+", f[5])
