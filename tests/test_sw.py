"""SSW-equivalent aligner vs frozen goldens from the reference's vendored SSW.

tests/golden/ssw_golden.txt was produced by compiling the reference's
src/ssw.c + src/ssw_cpp.cpp (CPU code) and running Aligner::Align with the
default CSSW parameters on generated cases (planted 3N alignments, junk,
N-containing, word-fallback-length, repeats).  Our aligner must match every
field bit-exactly: scores, second-best, begin/end positions, mismatches,
flag, and the =/X/S CIGAR string.
"""

import os

import pytest

from hashreadmapper_tpu.align import sw

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "ssw_golden.txt")


def _load_cases():
    cases = []
    with open(GOLDEN) as fh:
        for line in fh:
            if line.startswith("#") or not line.strip():
                continue
            left, right = line.split("|")
            q, r, m = left.split()
            p = right.split()
            cases.append((q, r, int(m), p))
    return cases


CASES = _load_cases()


@pytest.mark.parametrize("idx", range(0, len(CASES), 1))
def test_ssw_matches_reference(idx):
    q, r, m, p = CASES[idx]
    al = sw.ssw_align(q, r, m)
    got = [str(al.sw_score), str(al.sw_score_next_best), str(al.ref_begin),
           str(al.ref_end), str(al.query_begin), str(al.query_end),
           str(al.ref_end_next_best), str(al.mismatches), str(al.flag),
           al.cigar_string or "-"]
    assert got == p, (q, r, m)


def test_mapq_quirks():
    # trunc-then-add-4.99 double truncation
    assert sw.mapq_cssw(0, 0) == 4          # NaN -> 0 -> +4
    assert sw.mapq_cssw(100, 0) == 4        # inf -> 0 -> +4
    assert sw.mapq_cssw(100, 100) == 4      # log(1) = 0 -> +4
    assert sw.mapq_cssw(164, 20) == 13      # trunc(9.13) + 4
    assert sw.mapq_cssw(164, 2) == 23


def test_get_score():
    assert sw.get_score("A", "A") == 2
    assert sw.get_score("A", "C") == -2
    assert sw.get_score("N", "N") == -2
    assert sw.get_score("T", "T") == 2
    assert sw.get_score("?", "A") == 2  # default char maps to A
