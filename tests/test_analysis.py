"""genomic_analysis port: byte-exact vs compiled-reference goldens.

Goldens in tests/golden/genomic_analysis/ were produced by compiling the
reference's src_variant_calling / src_analysis sources unmodified and
running them on synthetic inputs (recipe: regen_recipe.py in the golden
dir; reference drivers rebuilt in /tmp per CLAUDE.md).  The synthetic SAM
covers: plain mismatches, all three reference-stream seek cases,
mid-read and refPos==0 insertions/deletions, soft+hard clips, N
wildcards on both sides, the SEQ_READ_SIZE=82 clamp, MAPQ filtering,
set-dedup of repeated variants, and >100 reads to trip the batch flush.
"""

import os

import pytest

from hashreadmapper_tpu.eval import analysis

GOLD = os.path.join(os.path.dirname(__file__), "golden", "genomic_analysis")


def _read(path):
    with open(path) as f:
        return f.read()


def test_variantcall_golden(tmp_path):
    out = tmp_path / "out.vcf"
    called, total = analysis.variantcall(
        os.path.join(GOLD, "golden.sam"),
        os.path.join(GOLD, "golden_ref.fasta"), str(out))
    assert (called, total) == (123, 124)   # one read is mapq<40
    assert _read(str(out)) == _read(os.path.join(GOLD, "golden_out.vcf"))


@pytest.fixture()
def vcf_layout(tmp_path):
    """The production variants/chr<CHR>/ layout the analyser reads."""
    d = tmp_path / "variants" / "chrT"
    d.mkdir(parents=True)
    for name in os.listdir(os.path.join(GOLD, "variants_chrT")):
        (d / name).write_text(
            _read(os.path.join(GOLD, "variants_chrT", name)))
    (tmp_path / "metadata.csv").write_text(
        _read(os.path.join(GOLD, "metadata.csv")))
    return tmp_path


def test_analyse_full_golden(vcf_layout, tmp_path):
    out = tmp_path / "out_full.csv"
    n = analysis.analyse(str(vcf_layout / "metadata.csv"), "T",
                         0, 2_000_000, str(out),
                         base_dir=str(vcf_layout))
    assert n == 3
    assert _read(str(out)) == _read(os.path.join(GOLD, "out_full.csv"))


def test_analyse_region_golden(vcf_layout, tmp_path):
    out = tmp_path / "out_region.csv"
    analysis.analyse(str(vcf_layout / "metadata.csv"), "T",
                     40, 210, str(out), base_dir=str(vcf_layout))
    assert _read(str(out)) == _read(os.path.join(GOLD, "out_region.csv"))


# --- the reference's own unit scenarios (src_analysis/tests/analyser.cpp)
# with the fixtures converted to the PRODUCTION comma format (the
# reference's tab fixtures fail its own assertions — see
# eval/analysis.py module docstring) -----------------------------------

_T1 = ["280,G,T", "295,A,G", "331,T,A", "345,C,A", "355,C,A",
       "356,A,C", "662,C,T", "667,A,G", "701,G,C", "707,A,G"]
_T2 = ["280,C,TT", "295,A,G", "331,T,A", "345,C,A", "355,C,A",
       "356,A,C", "662,C,T", "667,A,G"]
_T3 = ["280,T,C", "280,G,T", "280,T,G", "280,T,A", "280,C,TT"]


def _an_with(tmp_path, fixtures, region=(0, analysis._INT_MAX)):
    an = analysis.Analyser("", *region, batch_size=2)
    for i, lines in enumerate(fixtures):
        p = tmp_path / f"f{i}.vcf"
        p.write_text("\n".join(lines) + "\n")
        assert an.open_vcf(str(p))
    an.start()
    return an.rows


def test_same_file_twice(tmp_path):
    rows = _an_with(tmp_path, [_T1, _T1])
    assert len(rows) == 10
    assert all(r.endswith(",2") for r in rows)


def test_same_position_different_mutation(tmp_path):
    rows = _an_with(tmp_path, [_T1, _T2])
    assert len(rows) == 11
    assert rows[0] == "280,C,TT,1"
    assert rows[1] == "280,G,T,1"


def test_multiple_occurrences(tmp_path):
    rows = _an_with(tmp_path, [_T1, _T2, _T3])
    assert len(rows) == 14
    assert rows[2] == "280,T,A,1"
    assert rows[3] == "280,T,C,1"
    assert rows[4] == "280,T,G,1"


def test_regions_of_interest(tmp_path):
    rows = _an_with(tmp_path, [_T1], region=(331, 354))
    assert rows == ["331,T,A,1", "345,C,A,1"]


# --- quirk parity ------------------------------------------------------

def test_commaless_line_whole_line_variant(tmp_path):
    # analyser.cpp:86: find(',')==npos wraps npos+1 to 0 -> the WHOLE
    # line becomes the variant string (verified on the compiled ref)
    rows = _an_with(tmp_path, [["280\tG\tT"]])
    assert rows == ["280,280\tG\tT,1"]


def test_sam_line_without_trailing_tab_is_skipped(tmp_path):
    # sequencehandler.cpp:40-60: the seq column is only consumed if a
    # tab FOLLOWS it
    ref = tmp_path / "ref.fa"
    ref.write_text("ACGTACGTAC" * 50)
    sam = tmp_path / "in.sam"
    sam.write_text(".\t.\t.\t1\t60\t4M\t.\t.\t.\tAAAA\n")  # no tab after seq
    out = tmp_path / "out.vcf"
    called, total = analysis.variantcall(str(sam), str(ref), str(out))
    assert (called, total) == (0, 0)


def test_mapq_filter(tmp_path):
    ref = tmp_path / "ref.fa"
    ref.write_text("ACGTACGTAC" * 50)
    sam = tmp_path / "in.sam"
    sam.write_text(".\t.\t.\t1\t39\t4M\t.\t.\t.\tTTTT\t.\n"
                   ".\t.\t.\t1\t40\t4M\t.\t.\t.\tTTTT\t.\n")
    out = tmp_path / "out.vcf"
    called, total = analysis.variantcall(str(sam), str(ref), str(out))
    assert (called, total) == (1, 2)
    got = _read(str(out)).splitlines()
    # ACGT vs TTTT: mismatches at pos 1,3,4 (T==T at offset 3... ref
    # ACGT: A!=T, C!=T, G!=T, T==T)
    assert got == ["1,A,T", "2,C,T", "3,G,T"]


def test_cli_variantcall(tmp_path, capsys):
    out = tmp_path / "o.vcf"
    analysis.main(["variantcall", os.path.join(GOLD, "golden.sam"),
                   os.path.join(GOLD, "golden_ref.fasta"), str(out)])
    assert "Called variants on 123/124 reads" in capsys.readouterr().out
