"""Records-mode STEP 2/3 (struct-of-arrays + native bulk emit) vs the
AlignerArguments oracle writers — byte-identical SAM + VCF.

Covers: unmapped reads, RC orientation, end-of-chromosome windows,
degenerate (score-0) pairs, byte-saturated host-fallback pairs, PBAT
strands, quality scores, and chunked concat (the pipelined driver path).
"""

import numpy as np
import pytest

from hashreadmapper_tpu import native
from hashreadmapper_tpu.config import ProgramOptions
from hashreadmapper_tpu.io.genome import Genome
from hashreadmapper_tpu.io.readstore import ReadStorage, pack_rows
from hashreadmapper_tpu.pipeline import mapping
from hashreadmapper_tpu.pipeline.records import (MappingRecords, emit_sam,
                                                 emit_vcf)

from test_mapping_device import _setup

pytestmark = pytest.mark.skipif(not mapping.records_supported(),
                                reason="native emitters unavailable")


def _emit_both(aas, rec, genome, tmp_path, tag=""):
    p_aa = str(tmp_path / f"aa{tag}.sam")
    p_rec = str(tmp_path / f"rec{tag}.sam")
    s_aa = mapping.print_to_sam(aas, genome, p_aa)
    s_rec = emit_sam(rec, genome, p_rec)
    assert s_aa == s_rec
    assert open(p_aa, "rb").read() == open(p_rec, "rb").read()
    v_aa = mapping.do_vc(aas, genome, str(tmp_path / f"aa{tag}"))
    v_rec = emit_vcf(rec, genome, str(tmp_path / f"rec{tag}"))
    assert open(v_aa, "rb").read() == open(v_rec, "rb").read()


def test_records_byte_identity(tmp_path):
    genome, genome_rc, ori, pos, chrom, store, opts = _setup()
    aas = mapping._run_cssw_device(genome, genome_rc, ori, pos, chrom,
                                   store, opts)
    rec = mapping._run_cssw_device(genome, genome_rc, ori, pos, chrom,
                                   store, opts, as_records=True)
    assert isinstance(rec, MappingRecords)
    _emit_both(aas, rec, genome, tmp_path)


def test_records_saturated_pairs(tmp_path, monkeypatch):
    """128 bp exact-match reads score 256 > 255: the byte-mode device pass
    saturates and those pairs take the host word-mode fallback — records
    must patch scores/cigars from the fallback alignments identically."""
    import random
    rng = random.Random(11)
    chrom_s = "".join(rng.choice("ACGT") for _ in range(4000))
    genome = Genome(["c1"], [chrom_s])
    genome_rc = genome.reverse_complement()
    n = 24
    code = {"A": 0, "C": 1, "G": 2, "T": 3}
    mat = np.zeros((n, 128), np.uint8)
    pos = np.zeros(n, np.int64)
    for i in range(n):
        start = rng.randrange(0, 3800)
        mat[i] = [code[ch] for ch in chrom_s[start:start + 128]]
        # half the windows start exactly at the read: the full 128-base
        # match scores 256 > 255 and saturates the byte-mode device pass
        pos[i] = start if i % 2 else max(0, start - rng.randrange(0, 10))
    lengths = np.full(n, 128, np.int32)
    packed = pack_rows(mat, lengths, 8)
    store = ReadStorage(packed, lengths, np.zeros(n, bool))
    ori = np.full(n, mapping.FORWARD, np.int8)
    chrom = np.zeros(n, np.int32)
    opts = ProgramOptions(window_size=128, threads=2, max_read_length=128)
    # count host word-mode fallback reruns (the byte-saturation path);
    # both the AA and the records paths call sw.ssw_align per such pair
    from hashreadmapper_tpu.align import sw as swmod
    calls = {"n": 0}
    real_align = swmod.ssw_align

    def spy(*a, **kw):
        calls["n"] += 1
        return real_align(*a, **kw)

    monkeypatch.setattr(swmod, "ssw_align", spy)
    monkeypatch.setattr(mapping.sw, "ssw_align", spy)
    aas = mapping._run_cssw_device(genome, genome_rc, ori, pos, chrom,
                                   store, opts)
    n_aa = calls["n"]
    assert n_aa > 0, "no byte-saturated pairs: test setup lost its point"
    rec = mapping._run_cssw_device(genome, genome_rc, ori, pos, chrom,
                                   store, opts, as_records=True)
    assert calls["n"] == 2 * n_aa  # records path reran the same pairs
    _emit_both(aas, rec, genome, tmp_path, tag="sat")


def test_records_pbat(tmp_path):
    genome, genome_rc, ori, pos, chrom, store, opts = _setup(seed=21)
    rng = np.random.default_rng(21)
    bs = (rng.random(store.num_reads) < 0.5).astype(np.int8)
    bs_eff = ((bs != 0) & (ori == mapping.FORWARD)).astype(np.int8)
    aas = mapping._run_cssw_device(genome, genome_rc, ori, pos, chrom,
                                   store, opts, bs_strand=bs_eff)
    rec = mapping._run_cssw_device(genome, genome_rc, ori, pos, chrom,
                                   store, opts, bs_strand=bs_eff,
                                   as_records=True)
    _emit_both(aas, rec, genome, tmp_path, tag="pbat")


def test_records_qualities(tmp_path):
    from hashreadmapper_tpu.io.quality import QualityStore
    genome, genome_rc, ori, pos, chrom, store, opts = _setup(seed=7,
                                                             n_reads=40)
    qs = QualityStore(8)
    import random
    rng = random.Random(7)
    for i in range(store.num_reads):
        qs.append("".join(chr(33 + rng.randrange(0, 42))
                          for _ in range(int(store.lengths[i]))))
    store.qualities = qs
    opts.use_quality_scores = True
    aas = mapping.run_cssw(genome, genome_rc, ori, pos, chrom, store, opts)
    rec = mapping.run_cssw(genome, genome_rc, ori, pos, chrom, store, opts,
                           as_records=True)
    assert isinstance(rec, MappingRecords) and rec.qual is not None
    _emit_both(aas, rec, genome, tmp_path, tag="qual")


def test_records_concat_matches_whole(tmp_path):
    genome, genome_rc, ori, pos, chrom, store, opts = _setup(seed=13,
                                                             n_reads=90)
    whole = mapping._run_cssw_device(genome, genome_rc, ori, pos, chrom,
                                     store, opts, as_records=True)
    parts = []
    for c0 in range(0, store.num_reads, 37):
        c1 = min(c0 + 37, store.num_reads)
        parts.append(mapping._run_cssw_device(
            genome, genome_rc, ori[c0:c1], pos[c0:c1], chrom[c0:c1],
            store.slice_rows(c0, c1), opts, as_records=True))
    cat = MappingRecords.concat(parts)
    p1 = str(tmp_path / "whole.sam")
    p2 = str(tmp_path / "cat.sam")
    emit_sam(whole, genome, p1)
    emit_sam(cat, genome, p2)
    assert open(p1, "rb").read() == open(p2, "rb").read()
    v1 = emit_vcf(whole, genome, str(tmp_path / "whole"))
    v2 = emit_vcf(cat, genome, str(tmp_path / "cat"))
    assert open(v1, "rb").read() == open(v2, "rb").read()


def test_records_to_aas_oracle_bridge(tmp_path):
    """to_aas (the no-native fallback) reproduces the oracle writers'
    bytes from the records arrays alone."""
    genome, genome_rc, ori, pos, chrom, store, opts = _setup(seed=17)
    aas = mapping._run_cssw_device(genome, genome_rc, ori, pos, chrom,
                                   store, opts)
    rec = mapping._run_cssw_device(genome, genome_rc, ori, pos, chrom,
                                   store, opts, as_records=True)
    back = rec.to_aas()
    p1 = str(tmp_path / "a.sam")
    p2 = str(tmp_path / "b.sam")
    mapping.print_to_sam(aas, genome, p1)
    mapping.print_to_sam(back, genome, p2)
    assert open(p1, "rb").read() == open(p2, "rb").read()
    v1 = mapping.do_vc(aas, genome, str(tmp_path / "a"))
    v2 = mapping.do_vc(back, genome, str(tmp_path / "b"))
    assert open(v1, "rb").read() == open(v2, "rb").read()


@pytest.mark.parametrize("chunk", [0, 64])
def test_driver_pipeline_records_vs_objects(tmp_path, monkeypatch, chunk):
    """Full run_pipeline byte-identity: records mode (production) vs the
    AlignerArguments writers (records_supported monkeypatched off), in
    both the sequential and the pipelined-chunk drivers."""
    from test_pipelined_driver import make_dataset
    from hashreadmapper_tpu.pipeline.driver import run_pipeline

    fa, fq = make_dataset(tmp_path)

    def run(label, records_on):
        if not records_on:
            monkeypatch.setattr(mapping, "records_supported", lambda: False)
        else:
            monkeypatch.undo()
        opts = ProgramOptions(
            inputfiles=[fq], genomefile=fa,
            outputfile=str(tmp_path / f"out_{label}_{chunk}"),
            kmer_length=16, num_hash_functions=8, window_size=128,
            min_table_hits=2, batchsize=64, max_hamming_percent=0.2,
            probe_cap=16, candidates_per_read_cap=8, max_read_length=96,
            step2_pipeline_chunk=chunk, threads=2)
        return run_pipeline(opts), opts.outputfile

    r1, out1 = run("rec", True)
    assert isinstance(r1["mappingout"], MappingRecords)
    r2, out2 = run("obj", False)
    assert not isinstance(r2["mappingout"], MappingRecords)
    assert (open(out1 + ".SAM", "rb").read()
            == open(out2 + ".SAM", "rb").read())
    assert (open(out1 + ".VCF", "rb").read()
            == open(out2 + ".VCF", "rb").read())
