"""Native C++ layer == Python oracles (SSW goldens, NW, fastx parsing)."""

import os
import random

import numpy as np
import pytest

from hashreadmapper_tpu import native
from hashreadmapper_tpu.align import sw
from hashreadmapper_tpu.align.edit import nw_align

HERE = os.path.dirname(__file__)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def test_native_ssw_matches_goldens():
    with open(os.path.join(HERE, "golden", "ssw_golden.txt")) as fh:
        for line in fh:
            if line.startswith("#") or not line.strip():
                continue
            left, right = line.split("|")
            q, r, m = left.split()
            p = right.split()
            al = native.ssw_align_native(q, r, int(m))
            got = [str(al.sw_score), str(al.sw_score_next_best),
                   str(al.ref_begin), str(al.ref_end), str(al.query_begin),
                   str(al.query_end), str(al.ref_end_next_best),
                   str(al.mismatches), str(al.flag), al.cigar_string or "-"]
            assert got == p, (q, r, m)


def test_native_nw_matches_python():
    rng = random.Random(5)
    for _ in range(100):
        q = "".join(rng.choice("AGTN") for _ in range(rng.randint(1, 120)))
        t = "".join(rng.choice("AGTN") for _ in range(rng.randint(1, 128)))
        want_d, want_c = nw_align(q, t)
        got_d, got_c = native.nw_align_native(q, t)
        assert got_d == want_d, (q, t)
        assert got_c == want_c, (q, t)


def test_native_fastx(tmp_path):
    fa = tmp_path / "x.fa"
    fa.write_text(">r0\nACGTNN\nACGT\n>r1 desc\nTTnnTT\n")
    fq = tmp_path / "y.fq"
    fq.write_text("@a\nACGT\n+\nIIII\n@b\nNNNN\n+\nIIII\n")

    batches = list(native.read_fastx_native(str(fa), pitch=16))
    assert len(batches) == 1
    bases, lengths, amb = batches[0]
    assert lengths.tolist() == [10, 6]
    # round-robin N replacement persists across reads: NN->A,C ; nn->G,T
    assert bases[0, :10].tolist() == [0, 1, 2, 3, 0, 1, 0, 1, 2, 3]
    assert bases[1, :6].tolist() == [3, 3, 2, 3, 3, 3]
    assert amb.tolist() == [True, True]

    batches = list(native.read_fastx_native(str(fq), pitch=8))
    bases, lengths, amb = batches[0]
    assert lengths.tolist() == [4, 4]
    assert amb.tolist() == [False, True]


def test_native_gzip_fastx(tmp_path):
    import gzip
    fq = tmp_path / "z.fq.gz"
    with gzip.open(fq, "wt") as fh:
        for i in range(100):
            fh.write(f"@r{i}\nACGTACGT\n+\nIIIIIIII\n")
    total = 0
    for bases, lengths, amb in native.read_fastx_native(str(fq), pitch=8,
                                                        batch=32):
        total += len(lengths)
        assert (lengths == 8).all()
    assert total == 100


def test_native_fastx_robustness(tmp_path):
    # CRLF line endings, no trailing newline, long multi-line FASTA record
    p1 = tmp_path / "crlf.fq"
    p1.write_bytes(b"@a\r\nACGT\r\n+\r\nIIII\r\n@b\r\nTTTT\r\n+\r\nIIII")
    batches = list(native.read_fastx_native(str(p1), pitch=8))
    bases, lengths, amb = batches[0]
    assert lengths.tolist() == [4, 4]
    assert bases[1, :4].tolist() == [3, 3, 3, 3]

    p2 = tmp_path / "multi.fa"
    p2.write_text(">long\n" + "ACGT\n" * 50 + ">short\nGG")
    batches = list(native.read_fastx_native(str(p2), pitch=256))
    bases, lengths, amb = batches[0]
    assert lengths.tolist() == [200, 2]

    p3 = tmp_path / "bad.fq"
    p3.write_text("@x\nACGT\nOOPS\nIIII\n")  # missing '+' line
    import pytest as _pytest
    with _pytest.raises(ValueError):
        list(native.read_fastx_native(str(p3), pitch=8))


def test_myers_distance_multiblock_fuzz():
    """Native multi-block Myers bit-vector NW distance == plain DP."""
    import random

    from hashreadmapper_tpu import native
    if not native.available():
        pytest.skip("native library unavailable")
    lib = native.get_lib()

    def dp(q, t):
        m, n = len(q), len(t)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(prev[j - 1] + (q[i - 1] != t[j - 1]),
                             prev[j] + 1, cur[j - 1] + 1)
            prev = cur
        return prev[n]

    rng = random.Random(5)
    for trial in range(150):
        m = rng.randrange(0, 260)
        n = rng.randrange(0, 260)
        q = "".join(rng.choice("ACGT") for _ in range(m))
        t = "".join(rng.choice("ACGT") for _ in range(n))
        if trial % 3 == 0 and m and n:
            t = (q + t)[:n]
        assert lib.hrm_nw_distance(q.encode(), m, t.encode(), n) == dp(q, t)
