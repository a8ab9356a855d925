"""STEP 2 (fine alignment -> SAM) and STEP 3 (variant calling -> VCF).

Behavioral re-derivation of the reference's Mappinghandler
(reference: src/gpu/mappinghandler.cu):

  CSSW path (:383-774): per read, take the 128-base genome window at the
  coarse-mapped position plus the RC-genome "window" (the reference's
  off-by-design slice starting at chromLen - pos - 1), build 3N (C->T)
  versions, align (3N query vs 3N window) and (3N RC-query vs 3N window)
  with SSW, rescore bisulfite conversions along the CIGAR (:601-745),
  compute CSSW MAPQ, and emit the reference's exact SAM layout (:196-293)
  with Yf/YZ tags.  STEP 3 (doVC, :92-156) feeds the better-scoring
  alignment into the VariantHandler when MAPQ >= 20.

Faithfully-kept quirks (each cited inline): the rescoring swaps query/RC
( `if (!h) _query = rc_query` ), POS = window position + query_begin (begin
of the QUERY, the "shenanigan" in ssw_cpp.cpp:349-351), the RC window slice,
the 82-base rescoring horizon with negative bases_left arithmetic, and the
@PG header line missing its newline.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..align import sw
from ..config import ProgramOptions
from ..io.genome import Genome
from ..io.readstore import ReadStorage
from ..io.vcf import MAP_QUALITY_THRESHOLD, VariantHandler, parse_cigar
from ..cpu import oracle

FORWARD, REVERSE_COMPLEMENT, NONE = 1, 2, 3

_COMPLEMENT = str.maketrans("ACGT", "TGCA")


class AlignerArguments:
    """Mirror of the reference's AlignerArguments (mappinghandler.cuh:67-100).

    The RC/3N string variants are pure functions of `query`/`ref`
    (NucleoideConverer, mappinghandler.cu:163-179), so they are derived
    lazily — the batched device path never materializes them unless a
    host fallback (or a parity test) reads them.  `rc_ref` is NOT
    derivable from `ref` (it is a different genome slice) and stays
    stored.
    """
    __slots__ = ("read_id", "query", "ref", "rc_ref", "window_length",
                 "position", "chromosome_id", "flag", "flag_rc",
                 "alignments", "num_conversions", "mask_len", "qual",
                 "bs_strand",
                 "_rc_query", "_three_n_query", "_three_n_rc_query",
                 "_three_n_ref")

    def __init__(self):
        self.read_id = 0
        self.query = ""          # read, RC'd in place when orientation == RC
        self.ref = ""            # 128-base window (raw chars, N preserved)
        self.rc_ref = ""         # RC-genome slice starting at len - pos - 1
        self.window_length = 0
        self.position = 0
        self.chromosome_id = 0
        self.flag = 0
        self.flag_rc = 0
        self.alignments: Optional[List[sw.Alignment]] = None
        self.num_conversions: Optional[List[int]] = None
        self.mask_len = 15
        # stored quality aligned with `query` (reversed when orientation ==
        # RC); empty = reference parity ('*' in SAM).  Opt-in via
        # useQualityScores — the reference parses the flag but always
        # writes '*' (mappinghandler.cu:196-293); real QUAL exceeds it.
        self.qual = ""
        # 0 = directional C->T space; 1 = mirrored PBAT G->A space
        # (opts.undirectional coarse stage sets it per read)
        self.bs_strand = 0
        self._rc_query = None
        self._three_n_query = None
        self._three_n_rc_query = None
        self._three_n_ref = None

    @property
    def rc_query(self):
        if self._rc_query is None:
            self._rc_query = oracle.revcomp_str(self.query)
        return self._rc_query

    @rc_query.setter
    def rc_query(self, v):
        self._rc_query = v

    @property
    def three_n_query(self):
        if self._three_n_query is None:
            self._three_n_query = _three_n(self.query, self.bs_strand)
        return self._three_n_query

    @three_n_query.setter
    def three_n_query(self, v):
        self._three_n_query = v

    @property
    def three_n_rc_query(self):
        if self._three_n_rc_query is None:
            self._three_n_rc_query = _three_n(self.rc_query, self.bs_strand)
        return self._three_n_rc_query

    @three_n_rc_query.setter
    def three_n_rc_query(self, v):
        self._three_n_rc_query = v

    @property
    def three_n_ref(self):
        if self._three_n_ref is None:
            self._three_n_ref = _three_n(self.ref, self.bs_strand)
        return self._three_n_ref

    @three_n_ref.setter
    def three_n_ref(self, v):
        self._three_n_ref = v


def _three_n(s: str, bs_strand: int = 0) -> str:
    """NucleoideConverer (mappinghandler.cu:163-179): C -> T only.
    bs_strand=1 is the mirrored PBAT space: G -> A."""
    if bs_strand:
        return s.replace("G", "A")
    return s.replace("C", "T")


def _window_views(genome: Genome, genome_rc: Genome, chrom_id: int, pos: int,
                  window_size: int):
    """The reference's window + RC-window slices (mappinghandler.cu:430-450).

    The RC window starts at aef = chromLen - pos - 1; for pos < windowSize-1
    that slice runs past the chromosome end in the reference (string_view over
    the terminator) — we pad with NUL bytes, matching the first OOB byte.
    """
    seq = genome.sequence_str(chrom_id)
    seq_rc = genome_rc.sequence_str(chrom_id)
    size = len(seq)
    wlen = window_size if pos + window_size < size else size - pos
    wlen_rc = wlen
    window = seq[pos:pos + wlen]
    aef = size - pos - 1
    window_rc = seq_rc[aef:aef + wlen_rc]
    if len(window_rc) < wlen_rc:
        window_rc = window_rc + "\x00" * (wlen_rc - len(window_rc))
    return window, window_rc, wlen


def rescore_alignment(aa: AlignerArguments, h: int) -> None:
    """recalculateAlignmentScorefk (mappinghandler.cu:601-745).

    Walks the h-th alignment's CIGAR with an 82-base horizon, adjusting
    sw_score / sw_score_next_best where a query T aligns over a genomic C
    (bisulfite conversion) and counting conversions.  Quirk kept: h==0 uses
    rc_query, h==1 uses query (the reference's `if (!h)` swap).
    """
    ali = aa.alignments[h]
    num_conversions = 0
    _query = aa.query if h else aa.rc_query
    _ref = aa.ref
    rc_ref = aa.rc_ref
    if aa.bs_strand:
        # mirrored PBAT space: complementing every sequence maps the G->A
        # conversion patterns onto the reference's C->T walk below (the
        # score matrix is match/mismatch only, hence complement-invariant)
        _query = _query.translate(_COMPLEMENT)
        _ref = _ref.translate(_COMPLEMENT)
        rc_ref = rc_ref.translate(_COMPLEMENT)
    cig = parse_cigar(ali.cigar_string)
    ref_pos, alt_pos = 0, 0
    for op, length in cig:
        bases_left = min(82 - max(ref_pos, alt_pos), length)
        if op == "M":
            for i in range(max(0, bases_left)):
                if (alt_pos + i >= len(_query) or ref_pos + i >= len(_ref)
                        or ref_pos + i >= len(rc_ref)):
                    continue
                q = _query[alt_pos + i]
                r = _ref[ref_pos + i]
                if q == r or r == "N" or q == "N":
                    continue
                if q == "C":
                    if ((r == "T" and rc_ref[ref_pos + i] == "A")
                            or (r == "A" and rc_ref[ref_pos + i] == "T")):
                        ali.sw_score_next_best -= sw.get_score("T", r)
                        ali.sw_score_next_best += sw.get_score("C", r)
                        ali.sw_score -= sw.get_score("T", r)
                        ali.sw_score += sw.get_score("C", r)
                if q == "T":
                    if ((r == "C" and rc_ref[ref_pos + i] == "G")
                            or (r == "G" and rc_ref[ref_pos + i] == "C")):
                        num_conversions += 1
                        ali.sw_score_next_best -= sw.get_score("T", "T")
                        ali.sw_score_next_best += sw.get_score("T", r)
                        ali.sw_score -= sw.get_score("T", "T")
                        ali.sw_score += sw.get_score("T", r)
            ref_pos += bases_left
            alt_pos += bases_left
        elif op == "I":
            alt_pos += bases_left
        elif op == "D":
            ref_pos += bases_left
        elif op == "S":
            alt_pos += bases_left
        elif op == "H" or op == "P":
            pass
        elif op == "N":
            ref_pos += bases_left
        elif op == "X":
            ref_pos += bases_left
            alt_pos += bases_left
        elif op == "=":
            for i in range(max(0, bases_left)):
                if (alt_pos + i >= len(_query) or ref_pos + i >= len(_ref)
                        or ref_pos + i >= len(rc_ref)):
                    continue
                q = _query[alt_pos + i]
                r = _ref[ref_pos + i]
                if q == r or r == "N" or q == "N":
                    continue
                if q == "T":
                    if ((r == "C" and rc_ref[ref_pos + i] == "G")
                            or (r == "G" and rc_ref[ref_pos + i] == "C")):
                        num_conversions += 1
                        ali.sw_score_next_best -= 2
                        ali.sw_score_next_best += sw.get_score(q, r)
                        ali.sw_score -= 2
                        ali.sw_score += sw.get_score(q, r)
            ref_pos += bases_left
            alt_pos += bases_left
    aa.num_conversions[h] = num_conversions


def records_supported() -> bool:
    """True when the records-mode production path (struct-of-arrays STEP 2
    + native bulk emit, pipeline/records.py) can run."""
    from .. import native
    lib = native.get_lib()
    return (lib is not None and hasattr(lib, "hrm_rescore_batch")
            and native.emit_available())


def run_cssw(genome: Genome, genome_rc: Genome,
             orientation: np.ndarray, position: np.ndarray,
             chromosome_id: np.ndarray, reads: ReadStorage,
             opts: ProgramOptions,
             bs_strand: Optional[np.ndarray] = None,
             pre_scores: Optional[np.ndarray] = None,
             as_records: bool = False):
    """The CSSW mapping stage over all reads (mappinghandler.cu:383-774).

    Production path: batched argument construction + device striped-SW
    score passes (ops/swdev.py) + native CIGAR-only finish — bit-identical
    to the serial host path below (tests/test_mapping_device.py).
    pre_scores: the fused coarse+score pass output for ALL reads
    ([10, 2N] int16, engine.CoarseMapper._step2_scores) — skips the
    standalone score dispatch entirely.
    as_records: return a pipeline.records.MappingRecords struct-of-arrays
    (no per-read python objects; consumed by the native bulk SAM/VCF
    emitters) when the device+native path can produce one; callers must
    accept either return type.
    """
    from .. import native
    if bs_strand is None:
        bs_strand = np.zeros(len(orientation), dtype=np.int8)
    # The mirrored (G->A) STEP-2 treatment applies only to PBAT reads in
    # FORWARD orientation: an RC-oriented PBAT read's conversions appear as
    # C->T in query space (the RC of G->A), so the standard directional
    # C->T treatment is already the right one for it.
    bs_strand = ((np.asarray(bs_strand) != 0)
                 & (np.asarray(orientation) == FORWARD)).astype(np.int8)
    as_records = as_records and records_supported()
    out = None
    if (getattr(opts, "step2_device", False) and reads.num_reads > 0
            and native.available()):
        try:
            out = _run_cssw_device(genome, genome_rc, orientation, position,
                                   chromosome_id, reads, opts, bs_strand,
                                   pre_scores=pre_scores,
                                   as_records=as_records)
        except ImportError:
            pass  # no jax -> host path
    if out is None:
        out = _run_cssw_host(genome, genome_rc, orientation, position,
                             chromosome_id, reads, opts, bs_strand)
    if opts.use_quality_scores and reads.qualities is not None:
        from .records import MappingRecords
        if isinstance(out, MappingRecords):
            qm = np.zeros((out.n, out.lq), np.uint8)
            for r in range(out.n):
                q = reads.get_quality_str(r)
                if orientation[r] == REVERSE_COMPLEMENT:
                    q = q[::-1]
                b = np.frombuffer(q.encode("latin1"), np.uint8)
                qm[r, :len(b)] = b
            out.qual = qm
        else:
            for aa in out:
                q = reads.get_quality_str(aa.read_id)
                aa.qual = (q[::-1]
                           if orientation[aa.read_id] == REVERSE_COMPLEMENT
                           else q)
    return out


def _run_cssw_host(genome: Genome, genome_rc: Genome,
                   orientation: np.ndarray, position: np.ndarray,
                   chromosome_id: np.ndarray, reads: ReadStorage,
                   opts: ProgramOptions,
                   bs_strand: Optional[np.ndarray] = None
                   ) -> List[AlignerArguments]:
    """Serial host reference path (the oracle for the device path)."""
    out: List[AlignerArguments] = []
    n = reads.num_reads
    for r in range(n):
        read_len = int(reads.lengths[r])
        bases = list(reads.gather_bases([r], read_len)[0])
        if orientation[r] == REVERSE_COMPLEMENT:
            bases = oracle.revcomp_bases(bases)
        query = oracle.decode_bases(bases)
        pos = int(position[r])
        chrom = int(chromosome_id[r])

        window, window_rc, wlen = _window_views(
            genome, genome_rc, chrom, pos, opts.window_size)

        aa = AlignerArguments()
        aa.read_id = r
        if bs_strand is not None:
            aa.bs_strand = int(bs_strand[r])
        aa.query = query
        aa.rc_query = oracle.revcomp_str(query)
        aa.three_n_query = _three_n(query, aa.bs_strand)
        aa.three_n_rc_query = _three_n(aa.rc_query, aa.bs_strand)
        aa.ref = window
        aa.rc_ref = window_rc
        aa.three_n_ref = _three_n(window, aa.bs_strand)
        aa.window_length = wlen
        aa.position = pos
        aa.chromosome_id = chrom
        aa.mask_len = max(15, read_len // 2)
        aa.alignments = [sw.Alignment(), sw.Alignment()]
        aa.num_conversions = [0, 0]
        if orientation[r] == NONE:
            aa.flag |= 0x4
        out.append(aa)

    # parallelFor mapfk (mappinghandler.cu:560-595); the native threaded
    # batch path is bit-identical to the python oracle (tests/test_native.py)
    from .. import native
    mapped_aas = [aa for aa in out if not (aa.flag & 0x4)]
    if native.available() and mapped_aas:
        queries, refs, masks = [], [], []
        for aa in mapped_aas:
            queries.append(aa.three_n_query)
            refs.append(aa.three_n_ref)
            masks.append(aa.mask_len)
            queries.append(aa.three_n_rc_query)
            refs.append(aa.three_n_ref)
            masks.append(aa.mask_len)
        als = native.ssw_align_batch(queries, refs, masks,
                                     threads=max(1, opts.threads))
        for i, aa in enumerate(mapped_aas):
            aa.alignments[0] = als[2 * i]
            aa.flag = als[2 * i].flag
            aa.alignments[1] = als[2 * i + 1]
            aa.flag_rc = als[2 * i + 1].flag
    else:
        for aa in mapped_aas:
            al0 = sw.ssw_align(aa.three_n_query, aa.three_n_ref, aa.mask_len)
            aa.alignments[0] = al0
            aa.flag = al0.flag
            al1 = sw.ssw_align(aa.three_n_rc_query, aa.three_n_ref,
                               aa.mask_len)
            aa.alignments[1] = al1
            aa.flag_rc = al1.flag

    # parallelFor comparefk (mappinghandler.cu:747-766)
    for aa in out:
        if aa.flag & 0x4:
            continue
        rescore_alignment(aa, 0)
        rescore_alignment(aa, 1)
    return out


_BANDTB_CHUNK = 8192   # pairs per device banded-traceback dispatch
_B4 = np.frombuffer(b"ACGT", dtype=np.uint8)
_B5 = np.frombuffer(b"ACGTN", dtype=np.uint8)
_COMPL_U8 = np.arange(256, dtype=np.uint8)
for _a, _b in zip(b"ACGT", b"TGCA"):
    _COMPL_U8[_a] = _b
_3N_ASCII = np.arange(256, dtype=np.uint8)
_3N_ASCII[ord("C")] = ord("T")


def _run_cssw_device(genome: Genome, genome_rc: Genome,
                     orientation: np.ndarray, position: np.ndarray,
                     chromosome_id: np.ndarray, reads: ReadStorage,
                     opts: ProgramOptions,
                     bs_strand: Optional[np.ndarray] = None,
                     pre_scores: Optional[np.ndarray] = None,
                     as_records: bool = False):
    """Batched STEP 2: vectorized argument prep (replaces the reference's
    serial per-read loop, mappinghandler.cu:397-553), device striped-SW
    score passes (ops/swdev.py), native CIGAR-only finish.  Bit-identical
    to _run_cssw_host.  as_records=True keeps everything as flat arrays
    (MappingRecords) — no AlignerArguments objects are built."""
    from .. import native
    from ..ops import swdev
    from .records import MappingRecords

    import os
    import time as _time
    _marks = [("start", _time.perf_counter())] \
        if os.environ.get("HRM_STEP2_TIMING") else None

    def _mark(label):
        if _marks is not None:
            _marks.append((label, _time.perf_counter()))

    n = reads.num_reads
    lens = reads.lengths.astype(np.int64)
    lq = max(1, reads.max_length)
    mat = reads.bases_matrix(lq)                    # [n, LQ] codes 0..3
    idx = np.arange(lq, dtype=np.int32)
    lens32 = lens.astype(np.int32)
    valid = idx[None, :] < lens32[:, None]
    rev_idx = np.maximum(lens32[:, None] - 1 - idx[None, :], 0)
    rc_of = lambda m: np.where(valid, 3 - np.take_along_axis(m, rev_idx, 1), 0)
    # query = read, RC'd in place when orientation == RC (:420-423)
    fwd_mat = np.where((orientation == REVERSE_COMPLEMENT)[:, None],
                       rc_of(mat), mat)
    rcq_mat = rc_of(fwd_mat)

    # window + RC-window gathers (the _window_views slices, batched)
    ws = opts.window_size
    win = np.zeros((n, ws), np.uint8)
    win_rc = np.zeros((n, ws), np.uint8)
    wlens = np.zeros(n, np.int64)
    iw = np.arange(ws, dtype=np.int32)
    for c in np.unique(chromosome_id):
        rows = np.nonzero(chromosome_id == c)[0]
        seq = genome.seqs_ascii[int(c)]
        seq_rc = genome_rc.seqs_ascii[int(c)]
        size = len(seq)
        p = position[rows].astype(np.int32)      # window pos < chrom len
        wl = np.where(p + ws < size, ws, size - p)
        g = p[:, None] + iw[None, :]
        v = iw[None, :] < wl[:, None]
        win[rows] = np.where(v, seq[np.minimum(g, size - 1)], 0)
        aef = (size - p - 1).astype(np.int32)    # RC slice start (:430-450)
        g2 = aef[:, None] + iw[None, :]
        win_rc[rows] = np.where(v & (g2 < size),
                                seq_rc[np.minimum(g2, size - 1)], 0)
        wlens[rows] = wl

    _mark("array_prep")

    def build_out():
        """Per-read AlignerArguments (strings + records) — independent of
        the device scores, so it runs on a worker thread while the score
        chunks are collected/finished."""
        q_ascii = _B4[fwd_mat]
        rcq_ascii = _B4[rcq_mat]
        # one bulk decode per matrix; per-read strings are C-level slices
        # (the RC/3N variants are lazy properties, never built here)
        q_all = q_ascii.tobytes().decode("latin1")
        win_all = win.tobytes().decode("latin1")
        win_rc_all = win_rc.tobytes().decode("latin1")
        lens_l = lens32.tolist()
        wlens_l = wlens.tolist()
        pos_l = position.tolist()
        chrom_l = chromosome_id.tolist()
        unmapped_l = (orientation == NONE).tolist()
        strand_l = (bs_strand.tolist()
                    if bs_strand is not None and (bs_strand != 0).any()
                    else None)
        # unmapped reads share ONE read-only default pair (mapped reads get
        # fresh lists rebound in the assignment/rescore loops below);
        # nothing downstream mutates an unmapped read's alignments
        default_pair = [sw.Alignment(), sw.Alignment()]
        default_conv = [0, 0]
        built: List[AlignerArguments] = []
        for r in range(n):
            rl = lens_l[r]
            wlen = wlens_l[r]
            aa = AlignerArguments()
            aa.read_id = r
            aa.query = q_all[r * lq:r * lq + rl]
            aa.ref = win_all[r * ws:r * ws + wlen]
            aa.rc_ref = win_rc_all[r * ws:r * ws + wlen]
            aa.window_length = wlen
            aa.position = pos_l[r]
            aa.chromosome_id = chrom_l[r]
            aa.mask_len = rl // 2 if rl >= 30 else 15
            aa.alignments = default_pair
            aa.num_conversions = default_conv
            if strand_l is not None and strand_l[r]:
                aa.bs_strand = 1
            if unmapped_l[r]:
                aa.flag |= 0x4
            built.append(aa)
        return built, q_ascii, rcq_ascii

    def empty_records():
        n2 = 2 * n
        z32 = lambda k: np.zeros(k, np.int32)
        return MappingRecords(
            n=n, lq=lq, ws=ws, q=_B4[fwd_mat], q_len=lens32.astype(np.int32),
            win=win, win_len=wlens.astype(np.int32),
            position=position.astype(np.int64),
            chrom=chromosome_id.astype(np.int32),
            flag0=np.full(n, 0x4, np.int32), flag1=z32(n),
            sw=z32(n2), nb=z32(n2), qb=z32(n2), conv=z32(n2),
            cig_pool=np.zeros(0, np.uint8), cig_off=np.zeros(n2, np.int64),
            cig_len=z32(n2))

    m = np.nonzero(orientation != NONE)[0]
    nm = len(m)
    if nm == 0:
        if as_records:
            return empty_records()
        out, q_ascii, rcq_ascii = build_out()
        _mark("aa_build")
        return out
    # device pairs: [2i] = 3N query, [2i+1] = 3N RC query, same 3N ref.
    # bs_strand=1 reads use the mirrored PBAT collapse (G->A).
    und = (bs_strand is not None and bool((bs_strand != 0).any()))
    sc = (bs_strand != 0)[:, None] if und else None
    def collapse(mat):
        ct = np.where(mat == 1, 3, mat)
        if not und:
            return ct.astype(np.int8)
        ga = np.where(mat == 2, 0, mat)
        return np.where(sc, ga, ct).astype(np.int8)
    q3n = collapse(fwd_mat)
    rcq3n = collapse(rcq_mat)
    reft = sw.TRANSLATE[win].astype(np.int8)
    ref_ct = np.where(reft == 1, 3, reft)
    if und:
        ref_ga = np.where(reft == 2, 0, reft)
        ref3n = np.where(sc, ref_ga, ref_ct).astype(np.int8)
    else:
        ref3n = ref_ct
    P = 2 * nm
    pair_q = np.empty((P, lq), np.int8)
    pair_q[0::2] = q3n[m]
    pair_q[1::2] = rcq3n[m]
    pair_ref = np.repeat(ref3n[m], 2, axis=0)
    pair_rl = np.repeat(lens[m], 2).astype(np.int32)
    pair_fl = np.repeat(wlens[m], 2).astype(np.int32)
    pair_ml = np.repeat(np.maximum(15, lens[m] // 2), 2).astype(np.int32)

    chunk = max(256, int(opts.step2_pair_chunk))
    fields = ("score1", "score2", "ref_end", "ref_end2", "query_end",
              "ref_begin", "query_begin", "flag")
    dev = {k: np.empty(P, np.int32) for k in fields}
    dev["host_fallback"] = np.empty(P, bool)
    dev["degenerate"] = np.empty(P, bool)
    dev["diag"] = np.empty(P, bool)

    # device banded traceback (ops/bandtb.py): pairs not covered by the
    # all-M diag certificate get their CIGAR walk computed on device; the
    # native finish then only does the run-length build + =/X rewrite
    # (reference's banded_sw, ssw.c:550-790, runs per-pair on the host CPU)
    use_tb = bool(getattr(opts, "step2_device_traceback", True))
    from ..ops.bandtb import N_ENTRIES as _TB_ENTRIES
    ops_all = np.zeros((P, _TB_ENTRIES), np.int16) if use_tb else None
    fail_all = np.zeros(P, np.int8) if use_tb else None

    def tb_dispatch(s, e):
        """Enqueue banded-traceback chunks for pairs [s, e) that need the
        DP (uncertified, non-fallback, non-degenerate).  Fixed-size padded
        chunks keep the jit shape count bounded; pairs are ordered by
        initial band width so multi-pass pairs cluster into the same
        Pallas blocks (done blocks skip later doubling passes)."""
        if not use_tb:
            return None
        from ..ops import bandtb
        need = (~dev["diag"][s:e] & ~dev["host_fallback"][s:e]
                & ~dev["degenerate"][s:e])
        idx = np.nonzero(need)[0] + s
        if len(idx) == 0:
            return []
        m_sub = dev["query_end"][idx] - dev["query_begin"][idx]
        r_sub = dev["ref_end"][idx] - dev["ref_begin"][idx]
        idx = idx[np.argsort(np.abs(r_sub - m_sub), kind="stable")[::-1]]
        C = (_BANDTB_CHUNK if len(idx) > _BANDTB_CHUNK
             else max(128, 1 << (len(idx) - 1).bit_length()))
        out = []
        for c0 in range(0, len(idx), C):
            sub = idx[c0:c0 + C]
            pad = C - len(sub)
            subp = (np.concatenate([sub, np.repeat(sub[-1:], pad)])
                    if pad else sub)
            out.append((sub, bandtb.banded_traceback_dispatch(
                pair_q[subp], dev["query_begin"][subp],
                dev["query_end"][subp], pair_ref[subp],
                dev["ref_begin"][subp], dev["ref_end"][subp],
                dev["score1"][subp])))
        return out

    def tb_collect(handles):
        if not handles:
            return
        from ..ops import bandtb
        for sub, h in handles:
            ops, status = bandtb.banded_traceback_collect(h)
            ops_all[sub] = ops[:len(sub)]
            fail_all[sub] = status[:len(sub)]

    pending = []
    pre_tb = None
    if isinstance(pre_scores, tuple):
        # fully fused path: the coarse step also ran the banded traceback
        # in the same dispatch (engine._step2_scores -> bandtb.
        # fused_traceback); unpack (scores, tb_ops uint8, tb_status)
        pre_scores, pre_tb_ops, pre_tb_status = pre_scores
        pre_tb = (pre_tb_ops, pre_tb_status)
    if pre_scores is not None:
        # fused path: the coarse step already scored every (read x 2)
        # pair on device (engine._step2_scores); select the mapped reads'
        # interleaved pair rows
        idx = np.empty(2 * nm, np.int64)
        idx[0::2] = 2 * m
        idx[1::2] = 2 * m + 1
        sp = pre_scores[:, idx].astype(np.int32)
        dev["score1"], dev["ref_end"], dev["query_end"] = sp[0], sp[1], sp[2]
        dev["score2"], dev["ref_end2"], dev["ref_begin"] = sp[3], sp[4], sp[5]
        dev["query_begin"] = sp[6]
        dev["flag"] = np.where(sp[7] != 0, 2, 0).astype(np.int32)
        dev["host_fallback"] = sp[8] != 0
        dev["degenerate"] = (sp[0] == 0) | (sp[1] < 0)
        dev["diag"] = sp[9] != 0
        if use_tb and pre_tb is not None and pre_tb[0].shape[1] > 1:
            # device walk came back with the scores: uint8 run-length
            # entries (same op|len<<2 encoding, runs split at 63 — the
            # native finish merges adjacent same-op runs)
            ops_all = pre_tb[0][idx].astype(np.int16)
            fail_all = pre_tb[1][idx].astype(np.int8)
            tb_fused = []
        else:
            tb_fused = tb_dispatch(0, P)
    else:
        for s in range(0, P, chunk):
            e = min(s + chunk, P)
            pad = chunk - (e - s)
            sl = lambda a, fill: (np.concatenate(
                [a[s:e], np.full((pad,) + a.shape[1:], fill, a.dtype)])
                if pad else a[s:e])
            pending.append((s, e, swdev.ssw_score_dispatch(
                sl(pair_q, 4), sl(pair_rl, 1), sl(pair_ref, 4),
                sl(pair_fl, 1), sl(pair_ml, 15))))

    als: List[Optional[sw.Alignment]] = [None] * P
    mk = sw.Alignment
    _CIG_STRIDE = 1024
    if as_records:
        cl_all = np.zeros(P, np.int32)      # per-pair cigar lengths
        flags_all = np.zeros(P, np.int32)   # per-pair s_align flags
        raw_chunks: List[tuple] = []        # (fin, raw strided bytes, clens)

    def finish_range(s, e):
        """Banded CIGAR finish for pairs [s, e) (disjoint ranges, so
        safe to run concurrently with later chunks' collection — the
        reference overlaps its streams the same way,
        gpuminhasherconstruction.cu:89-108)."""
        fb_r = dev["host_fallback"][s:e]
        dg_r = dev["degenerate"][s:e] & ~fb_r
        fin = np.nonzero(~fb_r & ~dg_r)[0] + s
        nf = len(fin)
        if nf == 0:
            return
        tb_kw = (dict(dev_ops=ops_all[fin], dev_fail=fail_all[fin])
                 if use_tb else {})
        if as_records:
            raw_b, clens, _mism, flags = native.ssw_finish_batch(
                pair_q[fin].tobytes(),
                np.arange(nf, dtype=np.int64) * lq, pair_rl[fin],
                pair_ref[fin].tobytes(),
                np.arange(nf, dtype=np.int64) * ws, pair_fl[fin],
                dev["score1"][fin], dev["ref_begin"][fin],
                dev["ref_end"][fin], dev["query_begin"][fin],
                dev["query_end"][fin], dev["flag"][fin],
                threads=max(1, opts.threads), codes=True,
                diag=dev["diag"][fin], raw=True,
                cigar_stride=_CIG_STRIDE, **tb_kw)
            cl_all[fin] = clens
            flags_all[fin] = flags
            raw_chunks.append((fin, raw_b, clens))
            return
        cigars, mism, flags = native.ssw_finish_batch(
            pair_q[fin].tobytes(),
            np.arange(nf, dtype=np.int64) * lq, pair_rl[fin],
            pair_ref[fin].tobytes(),
            np.arange(nf, dtype=np.int64) * ws, pair_fl[fin],
            dev["score1"][fin], dev["ref_begin"][fin],
            dev["ref_end"][fin], dev["query_begin"][fin],
            dev["query_end"][fin], dev["flag"][fin],
            threads=max(1, opts.threads), codes=True,
            diag=dev["diag"][fin], **tb_kw)
        mism_l = mism.tolist()
        flags_l = flags.tolist()
        s1l = dev["score1"][fin].tolist()
        s2l = dev["score2"][fin].tolist()
        rbl = dev["ref_begin"][fin].tolist()
        rel = dev["ref_end"][fin].tolist()
        re2l = dev["ref_end2"][fin].tolist()
        qbl = dev["query_begin"][fin].tolist()
        qel = dev["query_end"][fin].tolist()
        for j, pi in enumerate(fin.tolist()):
            als[pi] = mk(
                sw_score=s1l[j], sw_score_next_best=s2l[j],
                ref_begin=rbl[j], ref_end=rel[j],
                query_begin=qbl[j], query_end=qel[j],
                ref_end_next_best=re2l[j],
                mismatches=mism_l[j], cigar_string=cigars[j],
                flag=flags_l[j])

    # collect each chunk, finishing it on CPU while the device still
    # computes / transfers the later chunks; the AlignerArguments
    # build (pure Python, score-independent) runs on a second worker
    # during the same window
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=2) as ex:
        aa_fut = None if as_records else ex.submit(build_out)
        futs = []
        if pre_scores is not None:
            _mark("device_score")
            tb_collect(tb_fused)
            _mark("bandtb")
            finish_range(0, P)
        else:
            tb_pend = []
            for s, e, packed_dev in pending:
                res = swdev.ssw_score_collect(packed_dev)
                for k in dev:
                    dev[k][s:e] = res[k][:e - s]
                tb_pend.append((s, e, tb_dispatch(s, e)))
            _mark("device_score")
            for s, e, handles in tb_pend:
                tb_collect(handles)
                futs.append(ex.submit(finish_range, s, e))
            _mark("bandtb")
        for f in futs:
            f.result()
        if aa_fut is not None:
            out, q_ascii, rcq_ascii = aa_fut.result()
        else:
            out = None
            q_ascii = _B4[fwd_mat]
            rcq_ascii = _B4[rcq_mat]
    fb = dev["host_fallback"]
    dg = dev["degenerate"] & ~fb
    _mark("native_finish")
    if as_records:
        return _assemble_records(
            n, lq, ws, nm, m, orientation, position, chromosome_id,
            lens, lens32, wlens, win, win_rc, q_ascii, rcq_ascii,
            pair_q, pair_ref, pair_rl, pair_fl, pair_ml,
            dev, fb, dg, cl_all, flags_all, raw_chunks, _CIG_STRIDE,
            bs_strand, und, opts, _mark, _marks)
    for pi in np.nonzero(dg)[0]:
        # ssw_align's early return (score 0): score-only result
        als[pi] = sw.Alignment(
            sw_score=int(dev["score1"][pi]),
            sw_score_next_best=int(dev["score2"][pi]),
            ref_begin=-1, ref_end=int(dev["ref_end"][pi]),
            query_begin=-1, query_end=int(dev["query_end"][pi]),
            ref_end_next_best=int(dev["ref_end2"][pi]))
    for pi in np.nonzero(fb)[0]:
        # byte saturation -> host word-mode rerun (align/sw.py:379-388)
        q = _B5[pair_q[pi, :pair_rl[pi]]].tobytes().decode("latin1")
        w = _B5[pair_ref[pi, :pair_fl[pi]]].tobytes().decode("latin1")
        als[pi] = sw.ssw_align(q, w, int(pair_ml[pi]))

    _mark("fallback_pairs")
    for i, r in enumerate(m):
        aa = out[r]
        aa.alignments = [als[2 * i], als[2 * i + 1]]  # rebind, never mutate
        aa.flag = als[2 * i].flag
        aa.flag_rc = als[2 * i + 1].flag

    # native batched rescoring (comparefk, mappinghandler.cu:747-766):
    # alignment h=0 rescored against rc_query, h=1 against query (the
    # reference's `if (!h)` swap)
    _mark("aa_assign")
    lib = native.get_lib()
    if lib is not None and hasattr(lib, "hrm_rescore_batch"):
        na = 2 * nm
        qa = np.empty((na, lq), np.uint8)
        qa[0::2] = rcq_ascii[m]
        qa[1::2] = q_ascii[m]
        qa_len = np.repeat(lens[m], 2).astype(np.int32)
        ref_rows = np.repeat(win[m], 2, axis=0)
        rcref_rows = np.repeat(win_rc[m], 2, axis=0)
        if und:
            # mirrored PBAT rescore via the complement trick (see
            # rescore_alignment): complement every sequence of style-1
            # alignments so the native C->T walk counts G->A conversions
            sp = np.repeat((bs_strand[m] != 0), 2)[:, None]
            qa = np.where(sp, _COMPL_U8[qa], qa)
            ref_rows = np.where(sp, _COMPL_U8[ref_rows], ref_rows)
            rcref_rows = np.where(sp, _COMPL_U8[rcref_rows], rcref_rows)
        wl2 = np.repeat(wlens[m], 2).astype(np.int32)
        cigs = [als[k].cigar_string for k in range(na)]
        cig_pool = "".join(cigs).encode("latin1")
        cig_len = np.array([len(c) for c in cigs], np.int32)
        cig_off = np.zeros(na, np.int64)
        np.cumsum(cig_len[:-1], out=cig_off[1:])
        sw_arr = np.array([als[k].sw_score for k in range(na)], np.int32)
        nb_arr = np.array([als[k].sw_score_next_best for k in range(na)],
                          np.int32)
        block = 1 << 17   # keeps int32 pool offsets safe
        conv = np.empty(na, np.int32)
        for b0 in range(0, na, block):
            b1 = min(b0 + block, na)
            nb_ = b1 - b0
            conv[b0:b1] = native.rescore_batch(
                qa[b0:b1].tobytes(),
                np.arange(nb_, dtype=np.int64) * lq, qa_len[b0:b1],
                ref_rows[b0:b1].tobytes(),
                np.arange(nb_, dtype=np.int64) * ws, wl2[b0:b1],
                rcref_rows[b0:b1].tobytes(),
                np.arange(nb_, dtype=np.int64) * ws, wl2[b0:b1],
                cig_pool[int(cig_off[b0]):int(cig_off[b1 - 1]
                                              + cig_len[b1 - 1])],
                cig_off[b0:b1] - cig_off[b0], cig_len[b0:b1],
                sw_arr[b0:b1], nb_arr[b0:b1],
                threads=max(1, opts.threads))
        sw_l, nb_l, conv_l = sw_arr.tolist(), nb_arr.tolist(), conv.tolist()
        for i, r in enumerate(m.tolist()):
            aa = out[r]
            a0, a1 = aa.alignments
            a0.sw_score = sw_l[2 * i]
            a0.sw_score_next_best = nb_l[2 * i]
            a1.sw_score = sw_l[2 * i + 1]
            a1.sw_score_next_best = nb_l[2 * i + 1]
            aa.num_conversions = [conv_l[2 * i], conv_l[2 * i + 1]]
        _mark("rescore")
        if _marks is not None:
            import sys as _sys
            for (l0, t0), (l1, t1) in zip(_marks, _marks[1:]):
                print(f"STEP2 {l1}: {t1 - t0:.3f}s", file=_sys.stderr,
                      flush=True)
        return out

    for aa in out:
        if aa.flag & 0x4:
            continue
        # build_out hands every read the shared default_conv list; the
        # rescore below mutates num_conversions[h] in place, so rebind a
        # fresh per-read list first (the native path rebinds its own)
        aa.num_conversions = [0, 0]
        rescore_alignment(aa, 0)
        rescore_alignment(aa, 1)
    return out


def _assemble_records(n, lq, ws, nm, m, orientation, position, chromosome_id,
                      lens, lens32, wlens, win, win_rc, q_ascii, rcq_ascii,
                      pair_q, pair_ref, pair_rl, pair_fl, pair_ml,
                      dev, fb, dg, cl_all, flags_all, raw_chunks, stride,
                      bs_strand, und, opts, _mark, _marks):
    """Records-mode tail of _run_cssw_device: patch degenerate/fallback
    pairs, pool the CIGAR bytes, rescore natively in place, and scatter
    the per-pair arrays into the [2n] MappingRecords layout."""
    from .. import native
    from .records import MappingRecords

    P = 2 * nm
    sw_pairs = np.ascontiguousarray(dev["score1"], np.int32)
    nb_pairs = np.ascontiguousarray(dev["score2"], np.int32)
    qb_pairs = np.ascontiguousarray(dev["query_begin"], np.int32).copy()
    qb_pairs[dg] = -1  # ssw_align's score-0 early return (query_begin=-1)
    fb_cigs = {}
    for pi in np.nonzero(fb)[0]:
        # byte saturation -> host word-mode rerun (align/sw.py:379-388)
        q = _B5[pair_q[pi, :pair_rl[pi]]].tobytes().decode("latin1")
        w = _B5[pair_ref[pi, :pair_fl[pi]]].tobytes().decode("latin1")
        al = sw.ssw_align(q, w, int(pair_ml[pi]))
        sw_pairs[pi] = al.sw_score
        nb_pairs[pi] = al.sw_score_next_best
        qb_pairs[pi] = al.query_begin
        flags_all[pi] = al.flag
        cb = al.cigar_string.encode("latin1")
        cl_all[pi] = len(cb)
        fb_cigs[int(pi)] = cb
    _mark("fallback_pairs")

    # pool the per-pair CIGAR bytes (strided native buffers -> compact)
    cig_off = np.zeros(P, np.int64)
    np.cumsum(cl_all[:-1], dtype=np.int64, out=cig_off[1:])
    pool = np.empty(int(cig_off[-1]) + int(cl_all[-1]) if P else 0,
                    np.uint8)
    for fin, raw_b, clens in raw_chunks:
        tot = int(clens.sum())
        if tot == 0:
            continue
        src = np.frombuffer(raw_b, np.uint8)
        cl64 = clens.astype(np.int64)
        within = (np.arange(tot, dtype=np.int64)
                  - np.repeat(np.cumsum(cl64) - cl64, cl64))
        starts_src = np.repeat(np.arange(len(fin), dtype=np.int64) * stride,
                               cl64)
        starts_dst = np.repeat(cig_off[fin], cl64)
        pool[starts_dst + within] = src[starts_src + within]
    for pi, cb in fb_cigs.items():
        o = int(cig_off[pi])
        pool[o:o + len(cb)] = np.frombuffer(cb, np.uint8)

    # native batched rescoring (comparefk, mappinghandler.cu:747-766):
    # alignment h=0 rescored against rc_query, h=1 against query (the
    # reference's `if (!h)` swap); adjusts sw/nb in place, emits conv
    qa = np.empty((P, lq), np.uint8)
    qa[0::2] = rcq_ascii[m]
    qa[1::2] = q_ascii[m]
    qa_len = np.repeat(lens[m], 2).astype(np.int32)
    ref_rows = np.repeat(win[m], 2, axis=0)
    rcref_rows = np.repeat(win_rc[m], 2, axis=0)
    if und:
        # mirrored PBAT rescore via the complement trick (rescore_alignment)
        sp = np.repeat((bs_strand[m] != 0), 2)[:, None]
        qa = np.where(sp, _COMPL_U8[qa], qa)
        ref_rows = np.where(sp, _COMPL_U8[ref_rows], ref_rows)
        rcref_rows = np.where(sp, _COMPL_U8[rcref_rows], rcref_rows)
    wl2 = np.repeat(wlens[m], 2).astype(np.int32)
    block = 1 << 17   # keeps int32 pool offsets safe
    conv = np.empty(P, np.int32)
    for b0 in range(0, P, block):
        b1 = min(b0 + block, P)
        nb_ = b1 - b0
        pool_b = pool[int(cig_off[b0]):
                      int(cig_off[b1 - 1]) + int(cl_all[b1 - 1])].tobytes()
        conv[b0:b1] = native.rescore_batch(
            qa[b0:b1].tobytes(),
            np.arange(nb_, dtype=np.int64) * lq, qa_len[b0:b1],
            ref_rows[b0:b1].tobytes(),
            np.arange(nb_, dtype=np.int64) * ws, wl2[b0:b1],
            rcref_rows[b0:b1].tobytes(),
            np.arange(nb_, dtype=np.int64) * ws, wl2[b0:b1],
            pool_b, cig_off[b0:b1] - cig_off[b0], cl_all[b0:b1],
            sw_pairs[b0:b1], nb_pairs[b0:b1],
            threads=max(1, opts.threads))
    _mark("rescore")

    # scatter per-pair arrays ([P] over mapped reads) into [2n]
    idx2 = np.empty(P, np.int64)
    idx2[0::2] = 2 * m
    idx2[1::2] = 2 * m + 1
    n2 = 2 * n
    z32 = lambda: np.zeros(n2, np.int32)
    sw2, nb2, qb2, conv2, cl2 = z32(), z32(), z32(), z32(), z32()
    co2 = np.zeros(n2, np.int64)
    sw2[idx2] = sw_pairs
    nb2[idx2] = nb_pairs
    qb2[idx2] = qb_pairs
    conv2[idx2] = conv
    cl2[idx2] = cl_all
    co2[idx2] = cig_off
    flag0 = np.zeros(n, np.int32)
    flag1 = np.zeros(n, np.int32)
    flag0[m] = flags_all[0::2]
    flag1[m] = flags_all[1::2]
    flag0[orientation == NONE] = 0x4
    if _marks is not None:
        import sys as _sys
        for (l0, t0), (l1, t1) in zip(_marks, _marks[1:]):
            print(f"STEP2 {l1}: {t1 - t0:.3f}s", file=_sys.stderr,
                  flush=True)
    return MappingRecords(
        n=n, lq=lq, ws=ws, q=q_ascii, q_len=lens32.astype(np.int32),
        win=win, win_len=wlens.astype(np.int32),
        position=position.astype(np.int64),
        chrom=chromosome_id.astype(np.int32),
        flag0=flag0, flag1=flag1, sw=sw2, nb=nb2, qb=qb2, conv=conv2,
        cig_pool=pool, cig_off=co2, cig_len=cl2)


def print_to_sam(mappingout: List[AlignerArguments], genome: Genome,
                 path: str) -> dict:
    """printtoSAM byte-layout replica (mappinghandler.cu:196-293)."""
    mapped = 0
    unmapped = 0
    with open(path, "w") as fh:
        fh.write("@HD\tVN:1.4\n")
        for aa in mappingout:
            fh.write(f"@SQ\tSN:{aa.read_id}\tLN:{aa.window_length}\n")
        # the reference omits the newline after the @PG line
        fh.write("@PG\tHashreadmapper\tID:1.0")
        fh.write("@CO: QNAME\tFLAG\tRNAME\tPOS\tMAPQ\tCIGAR\tRNEXT\tPNEXT\t"
                 "TLEN\tSEQ\tQUAL\tTAG\n")
        for aa in mappingout:
            a0, a1 = aa.alignments
            if a0.sw_score >= a1.sw_score:
                samtag = f"Yf:i:<{aa.num_conversions[0]}>YZ:A:<+>"
                samflag = aa.flag
                mapq = sw.mapq_cssw(a0.sw_score, a0.sw_score_next_best)
                pos = aa.position + a0.query_begin
                cig = a0.cigar_string
            else:
                samtag = f"Yf:i:<{aa.num_conversions[1]}>YZ:A:<->"
                samflag = aa.flag_rc
                mapq = sw.mapq_cssw(a1.sw_score, a1.sw_score_next_best)
                pos = aa.position + a1.query_begin
                cig = a1.cigar_string
            rname = genome.names[aa.chromosome_id]
            if (aa.flag & 0x4) == 0:
                mapped += 1
                tag = samtag
            else:
                unmapped += 1
                tag = str(aa.flag)
            fh.write(f"{aa.read_id}\t{samflag}\t{rname}\t{pos}\t{mapq}\t"
                     f"{cig}\t{aa.ref}\t\t0\t{aa.query}\t"
                     f"{aa.qual or '*'}\t{tag}\t\n")
    return {"mapped": mapped, "unmapped": unmapped}


def do_vc(mappingout: List[AlignerArguments], genome: Genome,
          outputfile: str) -> str:
    """doVC (mappinghandler.cu:92-156): STEP 3 variant calling."""
    path = outputfile + ".VCF"
    vh = VariantHandler(path)
    vh.vcf_file_header()
    for aa in mappingout:
        a0, a1 = aa.alignments
        h = 0 if a0.sw_score >= a1.sw_score else 1
        ali = aa.alignments[h]
        mapq = sw.mapq_cssw(ali.sw_score, ali.sw_score_next_best)
        if mapq < MAP_QUALITY_THRESHOLD:
            continue
        prefix = aa.ref[:max(0, ali.query_begin)]
        vh.call(aa.position + ali.query_begin, prefix, aa.ref, aa.query,
                parse_cigar(ali.cigar_string),
                genome.names[aa.chromosome_id], aa.read_id, mapq)
    vh.close()
    return path
