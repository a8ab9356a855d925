"""Device all-M certificate (swdev._diag_fastpath_flag) + native rewrite-only
finish vs the full host oracle (align/sw.py::ssw_align).

The certificate claims: equal-length matched subregions whose gapless
diagonal score equals score1 ALWAYS trace back as a single M run in the
reference's banded DP (proof in the swdev docstring), so the banded DP can
be skipped.  These tests stress the claim on substitution-only, indel, and
random-junk pairs: every pair — certified or not — must produce the exact
oracle cigar/mismatches/flag, and the certified set must actually cover the
substitution-only pairs (the fast path exists for a reason).
"""

import numpy as np
import pytest

from hashreadmapper_tpu import native
from hashreadmapper_tpu.align import sw
from hashreadmapper_tpu.ops import swdev

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")

_B5 = np.frombuffer(b"ACGTN", dtype=np.uint8)


def _decode(codes):
    return _B5[np.asarray(codes, np.int8)].tobytes().decode("latin1")


def _make_pairs(rng, n, lq=100, lr=128):
    """Planted reads: subs-only, with-indel, and pure junk thirds."""
    kinds = []
    reads = np.full((n, lq), 4, np.int8)
    refs = np.full((n, lr), 4, np.int8)
    rls = np.empty(n, np.int32)
    fls = np.empty(n, np.int32)
    for i in range(n):
        fl = int(rng.integers(lr // 2, lr + 1))
        ref = rng.integers(0, 4, fl).astype(np.int8)
        kind = i % 3
        rl = int(rng.integers(30, min(lq, fl) + 1))
        off = int(rng.integers(0, fl - rl + 1))
        read = ref[off:off + rl].copy()
        sub = rng.random(rl) < 0.03
        read[sub] = rng.integers(0, 4, int(sub.sum()))
        if kind == 1:
            # force an indel: delete or insert 1-3 bases mid-read
            k = int(rng.integers(1, 4))
            p = rl // 2
            if rng.random() < 0.5 and rl > k + 10:
                read = np.concatenate([read[:p], read[p + k:],
                                       rng.integers(0, 4, k)]).astype(np.int8)
            else:
                read = np.concatenate(
                    [read[:p], rng.integers(0, 4, k),
                     read[p:rl - k]]).astype(np.int8)
            rl = len(read)
        elif kind == 2:
            read = rng.integers(0, 4, rl).astype(np.int8)
        kinds.append(kind)
        reads[i, :rl] = read
        refs[i, :fl] = ref
        rls[i] = rl
        fls[i] = fl
    return reads, rls, refs, fls, np.array(kinds)


def test_diag_certified_pairs_match_oracle():
    rng = np.random.default_rng(23)
    n = 192
    reads, rls, refs, fls, kinds = _make_pairs(rng, n)
    masks = np.maximum(15, rls // 2).astype(np.int32)
    res = swdev.ssw_score_batch(reads, rls, refs, fls, masks)
    ok = ~res["host_fallback"] & ~res["degenerate"]
    lq, lr = reads.shape[1], refs.shape[1]
    fin = np.nonzero(ok)[0]
    nf = len(fin)
    cigars, mism, flags = native.ssw_finish_batch(
        reads[fin].tobytes(), np.arange(nf, dtype=np.int64) * lq, rls[fin],
        refs[fin].tobytes(), np.arange(nf, dtype=np.int64) * lr, fls[fin],
        res["score1"][fin], res["ref_begin"][fin], res["ref_end"][fin],
        res["query_begin"][fin], res["query_end"][fin], res["flag"][fin],
        threads=2, codes=True, diag=res["diag"][fin])

    n_diag = int(res["diag"][fin].sum())
    assert n_diag > 0, "no pair took the fast path"
    # substitution-only planted pairs must overwhelmingly certify
    subs_only = ok & (kinds == 0)
    assert res["diag"][subs_only].mean() > 0.9

    for j, i in enumerate(fin.tolist()):
        oracle = sw.ssw_align(_decode(reads[i][:rls[i]]),
                              _decode(refs[i][:fls[i]]), int(masks[i]))
        assert cigars[j] == oracle.cigar_string, (i, kinds[i])
        assert mism[j] == oracle.mismatches, (i, kinds[i])
        assert flags[j] == oracle.flag, (i, kinds[i])
        if res["diag"][i]:
            # the certificate's claim, re-checked against the oracle's
            # banded walk: one clipped all-=/X cigar, no I/D ops
            assert "I" not in oracle.cigar_string
            assert "D" not in oracle.cigar_string


def test_diag_flag_never_set_on_indel_paths():
    """An indel in the optimal path implies m != r or diag_sum < score1 —
    the certificate must not fire (it would corrupt the cigar)."""
    rng = np.random.default_rng(5)
    n = 96
    reads, rls, refs, fls, kinds = _make_pairs(rng, n)
    masks = np.maximum(15, rls // 2).astype(np.int32)
    res = swdev.ssw_score_batch(reads, rls, refs, fls, masks)
    ok = ~res["host_fallback"] & ~res["degenerate"]
    for i in np.nonzero(ok)[0]:
        oracle = sw.ssw_align(_decode(reads[i][:rls[i]]),
                              _decode(refs[i][:fls[i]]), int(masks[i]),
                              compute_cigar=True)
        has_indel = ("I" in oracle.cigar_string
                     or "D" in oracle.cigar_string)
        if res["diag"][i]:
            assert not has_indel, i
