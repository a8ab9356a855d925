"""VariantHandler vs frozen goldens from the compiled reference VariantHandler.

tests/golden/vcf_calls.txt drives both; vcf_expected.vcf was captured from the
reference's varianthandler.cpp + cigar.cpp compiled on this machine.
"""

import os

from hashreadmapper_tpu.io.vcf import VariantHandler, parse_cigar

HERE = os.path.dirname(__file__)


def test_vcf_matches_reference_golden(tmp_path):
    calls = []
    with open(os.path.join(HERE, "golden", "vcf_calls.txt")) as fh:
        for line in fh:
            if line.startswith("#") or not line.strip():
                continue
            p, pre, r, a, c, ch, ri, q = line.rstrip("\n").split("|")
            calls.append((int(p), "" if pre == "-" else pre, r, a, c, ch,
                          int(ri), int(q)))
    out = tmp_path / "out.vcf"
    vh = VariantHandler(str(out))
    vh.vcf_file_header()
    for p, pre, r, a, c, ch, ri, q in calls:
        vh.call(p, pre, r, a, parse_cigar(c), ch, ri, q)
    vh.close()
    want = open(os.path.join(HERE, "golden", "vcf_expected.vcf")).read()
    got = open(out).read()
    assert got == want


def test_parse_cigar():
    assert parse_cigar("3S10=1X2I4D") == [
        (("S"), 3), (("="), 10), (("X"), 1), (("I"), 2), (("D"), 4)]
    assert parse_cigar("") == []


def test_tail_never_flushed(tmp_path):
    """The reference never force-flushes; trailing variants are dropped."""
    out = tmp_path / "t.vcf"
    vh = VariantHandler(str(out))
    vh.vcf_file_header()
    vh.call(100, "", "A", "C", parse_cigar("1M"), "chr1", 1, 30)
    vh.close()
    lines = open(out).read().splitlines()
    assert len(lines) == 2  # header only; the variant stays buffered


def test_flush_uses_current_metadata(tmp_path):
    """Buffered variants are written with the flushing call's chrom/id/qual."""
    out = tmp_path / "t.vcf"
    vh = VariantHandler(str(out))
    vh.vcf_file_header()
    vh.call(100, "", "A", "C", parse_cigar("1M"), "chr1", 1, 30)
    vh.call(500, "", "G", "T", parse_cigar("1M"), "chr2", 9, 55)
    vh.close()
    lines = open(out).read().splitlines()
    assert lines[2] == "chr2\t100\t9\tA\tC\t55\t\t\t\t".rstrip("\n")
