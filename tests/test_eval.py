"""Evaluation tooling: compare1-equivalent, window stats, variant matching."""

import random

import numpy as np

from hashreadmapper_tpu.config import ProgramOptions
from hashreadmapper_tpu.cpu import oracle
from hashreadmapper_tpu.eval import compare, variants, window_stats
from hashreadmapper_tpu.io.genome import Genome
from hashreadmapper_tpu.pipeline.engine import CoarseMapper


def _planted_dataset(seed=21, n_reads=40, chrom_len=3000, read_len=60):
    rng = random.Random(seed)
    chrom = "".join(rng.choice("ACGT") for _ in range(chrom_len))
    reads, truth = [], []
    for i in range(n_reads):
        start = rng.randrange(0, chrom_len - read_len)
        b = oracle.encode_bases(chrom[start:start + read_len])
        rc = rng.random() < 0.5
        if rc:
            b = oracle.revcomp_bases(b)
        reads.append(b)
        truth.append((start, rc))
    return chrom, reads, truth


def test_compare_concordance_on_planted_reads():
    chrom, reads, truth = _planted_dataset()
    genome = Genome(["chrC"], [chrom])
    opts = ProgramOptions(
        kmer_length=16, num_hash_functions=16, window_size=128,
        min_table_hits=4, batchsize=64, max_hamming_percent=0.05,
        probe_cap=64, candidates_per_read_cap=32, max_read_length=64)
    mapper = CoarseMapper(genome, opts)
    bases = np.zeros((len(reads), 64), dtype=np.int8)
    lens = np.zeros(len(reads), dtype=np.int32)
    for i, r in enumerate(reads):
        bases[i, :len(r)] = r
        lens[i] = len(r)
    res = mapper.map_reads(bases, lens)

    truth_recs = [
        compare.TruthRecord(read_id=i, flags=(0x10 if rc else 0),
                            chromosome="chrC", position=start)
        for i, (start, rc) in enumerate(truth)]
    mapper_recs = compare.mapper_records_from_results(res, genome, lens)
    stats = compare.compare_mappings(genome, truth_recs, mapper_recs)
    # every mapped planted read must be fully concordant (status 1111)
    n_mapped = int((res.orientation != 3).sum())
    full = stats.status_histogram.get(0b1111, 0)
    assert full + stats.num_clipped + stats.one_is_unmapped == len(truth)
    assert full >= n_mapped - stats.num_clipped
    assert stats.concordant() >= full


def test_window_truth_and_collector():
    chrom = "ACGT" * 300
    genome = Genome(["c"], [chrom])
    truth = window_stats.truth_windows_from_alignments(
        genome, 128, 16, [(0, 0, 100, 60), (1, 0, 150, 60), (2, 0, 800, 60)])
    assert all(isinstance(k, tuple) for k in truth)
    coll = window_stats.WindowHitStatisticCollector(truth)
    for (cid, wid), rids in truth.items():
        coll.add_hits(cid, wid, list(rids) + [999])  # one false hit each
    rep = coll.report()
    assert rep["recall"] == 1.0
    assert rep["false_hits"] == len(truth)
    assert 0 < rep["precision"] < 1


def test_window_overlap_semantics():
    chrom = "A" * 2000
    genome = Genome(["c"], [chrom])
    # stride = 113; a read at pos 100 len 60: windows 0 ([0,113)) overlap 13,
    # window 1? no — window ids cover [wid*113, (wid+1)*113)
    wid = window_stats.window_id_with_overlap(genome, 128, 16, 0, 100, 60, 30)
    assert wid == 1  # overlap with window 1 ([113,226)) is 47 >= 30
    wid = window_stats.window_id_with_overlap(genome, 128, 16, 0, 100, 60, 10)
    assert wid == 0  # window 0 overlap 13 >= 10, first wins


def test_variant_matching(tmp_path):
    ref_csv = tmp_path / "ref.csv"
    ref_csv.write_text("1;100;C;T;G1\n1;200;A;G;G2\n2;300;G;C;G3\n")
    vcf = tmp_path / "out.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n#CHROM\t...\n"
        "1\t100\t7\tC\tT\t44\t\t\t\t\n"     # match
        "1\t200\t8\tA\tC\t44\t\t\t\t\n")    # alt mismatch; chr2 missing
    ref = variants.load_reference_variants(str(ref_csv))
    called = variants.load_called_variants_vcf(str(vcf))
    rep = variants.match_variants(ref, called)
    assert rep.total == 3
    assert rep.matched == 1
    assert rep.alt_mismatches == 1
    assert rep.missing == 1


def test_engine_candidate_collection_feeds_window_stats():
    """COUNT_WINDOW_HITS-equivalent instrumentation through the engine."""
    chrom, reads, truth = _planted_dataset(seed=3, n_reads=30)
    genome = Genome(["chrW"], [chrom])
    opts = ProgramOptions(
        kmer_length=16, num_hash_functions=16, window_size=128,
        min_table_hits=4, batchsize=32, max_hamming_percent=0.05,
        probe_cap=64, candidates_per_read_cap=32, max_read_length=64)
    mapper = CoarseMapper(genome, opts)
    bases = np.zeros((len(reads), 64), dtype=np.int8)
    lens = np.zeros(len(reads), dtype=np.int32)
    for i, r in enumerate(reads):
        bases[i, :len(r)] = r
        lens[i] = len(r)
    res = mapper.map_reads(bases, lens, collect_candidates=True)
    cand_ids, cand_ori = mapper.last_candidates
    assert cand_ids.shape == (len(reads), opts.candidates_per_read_cap)

    # truth windows (>=50% overlap) and the two collectors: after hashing
    # (all candidates) and after SHD (orientation != None)
    aligns = [(i, 0, s, len(reads[i])) for i, (s, rc) in enumerate(truth)]
    tw = window_stats.truth_windows_from_alignments(genome, 128, 16, aligns)
    win_chrom = np.asarray(mapper.table.win_chrom)
    win_pos = np.asarray(mapper.table.win_pos)
    stride = opts.window_stride
    after_hash = window_stats.WindowHitStatisticCollector(tw)
    after_shd = window_stats.WindowHitStatisticCollector(tw)
    for rid in range(len(reads)):
        for slot in range(cand_ids.shape[1]):
            g = cand_ids[rid, slot]
            if g == 0xFFFFFFFF:
                continue
            cid = int(win_chrom[g])
            wid = int(win_pos[g]) // stride
            after_hash.add_hits(cid, wid, [rid])
            if cand_ori[rid, slot] != 3:
                after_shd.add_hits(cid, wid, [rid])
    rh = after_hash.report()
    rs = after_shd.report()
    assert rs["true_hits"] <= rh["true_hits"]
    assert rs["precision"] >= rh["precision"]
    assert rh["recall"] > 0.5
