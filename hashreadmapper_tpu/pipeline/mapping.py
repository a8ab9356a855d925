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

import dataclasses
from typing import List, Optional

import numpy as np

from ..align import sw
from ..config import ProgramOptions
from ..io.genome import Genome
from ..io.readstore import ReadStorage
from ..io.vcf import MAP_QUALITY_THRESHOLD, VariantHandler, parse_cigar
from ..cpu import oracle

FORWARD, REVERSE_COMPLEMENT, NONE = 1, 2, 3


@dataclasses.dataclass
class AlignerArguments:
    """Mirror of the reference's AlignerArguments (mappinghandler.cuh:67-100)."""
    read_id: int = 0
    query: str = ""            # read, RC'd in place when orientation == RC
    rc_query: str = ""
    three_n_query: str = ""
    three_n_rc_query: str = ""
    ref: str = ""              # 128-base window (raw chars, N preserved)
    rc_ref: str = ""           # RC-genome slice starting at len - pos - 1
    three_n_ref: str = ""
    window_length: int = 0
    position: int = 0
    chromosome_id: int = 0
    flag: int = 0
    flag_rc: int = 0
    alignments: Optional[List[sw.Alignment]] = None
    num_conversions: Optional[List[int]] = None
    mask_len: int = 15


def _three_n(s: str) -> str:
    """NucleoideConverer (mappinghandler.cu:163-179): C -> T only."""
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


def run_cssw(genome: Genome, genome_rc: Genome,
             orientation: np.ndarray, position: np.ndarray,
             chromosome_id: np.ndarray, reads: ReadStorage,
             opts: ProgramOptions) -> List[AlignerArguments]:
    """The CSSW mapping stage over all reads (mappinghandler.cu:383-774)."""
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
        aa.query = query
        aa.rc_query = oracle.revcomp_str(query)
        aa.three_n_query = _three_n(query)
        aa.three_n_rc_query = _three_n(aa.rc_query)
        aa.ref = window
        aa.rc_ref = window_rc
        aa.three_n_ref = _three_n(window)
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
                     f"{cig}\t{aa.ref}\t\t0\t{aa.query}\t*\t{tag}\t\n")
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
