"""End-to-end byte-snapshot: the full pipeline's SAM/VCF must be stable.

Locks the complete output byte stream (coarse mapping + SSW + rescoring +
MAPQ + SAM layout + VCF) against regressions.  If a deliberate semantic
change alters the output, regenerate the goldens (see git history for the
generation recipe) and justify the diff in the commit.
"""

import os
import random

from hashreadmapper_tpu.config import MapperType, ProgramOptions
from hashreadmapper_tpu.io import fastx
from hashreadmapper_tpu.pipeline.driver import run_pipeline

HERE = os.path.dirname(__file__)


def test_pipeline_snapshot(tmp_path):
    rng = random.Random(2026)
    chrom = "".join(rng.choice("ACGT") for _ in range(2500))
    with open(tmp_path / "g.fa", "w") as fh:
        fh.write(f">chrS snapshot\n{chrom}\n")
    recs = []
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    for i in range(30):
        s = rng.randrange(0, 2400)
        seq = list(chrom[s:s + 70])
        if rng.random() < 0.5:
            seq = [comp[c] for c in reversed(seq)]
        seq = ["T" if (c == "C" and rng.random() < 0.1) else c for c in seq]
        if rng.random() < 0.3:
            seq[rng.randrange(70)] = rng.choice("ACGT")
        recs.append(fastx.SequenceRecord(f"r{i}", "", "".join(seq)))
    recs.append(fastx.SequenceRecord(
        "junk", "", "".join(rng.choice("ACGT") for _ in range(50))))
    recs.append(fastx.SequenceRecord("short", "", "ACGT"))
    fastx.write_fastq(str(tmp_path / "r.fq"), recs)

    opts = ProgramOptions(
        genomefile=str(tmp_path / "g.fa"),
        inputfiles=[str(tmp_path / "r.fq")],
        outputfile=str(tmp_path / "out"), kmer_length=16,
        num_hash_functions=16, window_size=128, min_table_hits=4,
        batchsize=32, max_hamming_percent=0.25, probe_cap=64,
        candidates_per_read_cap=32, max_read_length=80,
        mapper_type=MapperType.SW)
    res = run_pipeline(opts)
    sam = open(res["sam_path"]).read()
    vcf = open(res["vcf_path"]).read()
    want_sam = open(os.path.join(HERE, "golden", "snapshot.SAM")).read()
    want_vcf = open(os.path.join(HERE, "golden", "snapshot.VCF")).read()
    assert sam == want_sam
    assert vcf == want_vcf
