"""Chunked STEP1/STEP2 pipeline == strictly sequential phases, byte-exact."""

import gzip
import os

import numpy as np
import pytest

from hashreadmapper_tpu.config import ProgramOptions
from hashreadmapper_tpu.pipeline.driver import run_pipeline


def make_dataset(tmp_path, n_reads=200, chrom_len=20000, read_len=80,
                 seed=3):
    rng = np.random.default_rng(seed)
    b2c = np.array(list("ACGT"))
    chrom_bases = rng.integers(0, 4, chrom_len, dtype=np.int8)
    chrom = "".join(b2c[chrom_bases])
    fa = tmp_path / "g.fa"
    fa.write_text(">chrP test\n" + "\n".join(
        chrom[i:i + 70] for i in range(0, chrom_len, 70)) + "\n")
    comp = str.maketrans("ACGT", "TGCA")
    fq = tmp_path / "r.fq.gz"
    with gzip.open(fq, "wt") as f:
        for i in range(n_reads):
            s = rng.integers(0, chrom_len - read_len)
            r = chrom[s:s + read_len]
            if rng.random() < 0.5:
                r = r.translate(comp)[::-1]
            f.write(f"@r{i}\n{r}\n+\n{'I' * read_len}\n")
    return str(fa), str(fq)


@pytest.mark.parametrize("three_n", [False, True])
def test_pipelined_matches_sequential(tmp_path, three_n):
    fa, fq = make_dataset(tmp_path)
    outs = {}
    for label, chunk in (("seq", 0), ("pipe", 64)):
        opts = ProgramOptions(
            inputfiles=[fq], genomefile=fa,
            outputfile=str(tmp_path / f"out_{label}_{three_n}"),
            kmer_length=16, num_hash_functions=8, window_size=128,
            min_table_hits=2, batchsize=64, max_hamming_percent=0.2,
            probe_cap=16, candidates_per_read_cap=8, max_read_length=96,
            three_n_seeding=three_n, step2_pipeline_chunk=chunk,
            shd_pairs_per_read_budget=4, probe_tail_budget_per_read=4)
        run_pipeline(opts)
        outs[label] = (
            open(opts.outputfile + ".SAM").read(),
            open(opts.outputfile + ".VCF").read())
    assert outs["seq"][0] == outs["pipe"][0], "SAM differs"
    assert outs["seq"][1] == outs["pipe"][1], "VCF differs"
    # the pipelined run actually split into multiple chunks: n_reads must
    # exceed the pipeline chunk size used for the "pipe" run above
    n_reads = outs["seq"][0].count("\n@SQ")
    assert n_reads > 64, f"dataset too small to exercise chunking: {n_reads}"


def test_pipelined_wide_reads_nonslim_bundle(tmp_path):
    """max_read_length > 255 disables the uint8 score-row slimming in the
    streaming driver (driver.py slim gate); the int16 bundle decode path
    must stay byte-exact vs the sequential phases."""
    fa, fq = make_dataset(tmp_path)
    outs = {}
    for label, chunk in (("seq", 0), ("pipe", 64)):
        opts = ProgramOptions(
            inputfiles=[fq], genomefile=fa,
            outputfile=str(tmp_path / f"out_w_{label}"),
            kmer_length=16, num_hash_functions=8, window_size=128,
            min_table_hits=2, batchsize=64, max_hamming_percent=0.2,
            probe_cap=16, candidates_per_read_cap=8, max_read_length=260,
            three_n_seeding=True, step2_pipeline_chunk=chunk,
            shd_pairs_per_read_budget=4, probe_tail_budget_per_read=4)
        run_pipeline(opts)
        outs[label] = (
            open(opts.outputfile + ".SAM").read(),
            open(opts.outputfile + ".VCF").read())
    assert outs["seq"][0] == outs["pipe"][0], "SAM differs (non-slim)"
    assert outs["seq"][1] == outs["pipe"][1], "VCF differs (non-slim)"
