"""Undirectional (PBAT) bisulfite mode: all four strand spaces map.

Capability extension beyond the reference (whose commented-out 3N seeding
was directional-only): --undirectional additionally probes GA(read) /
CT(RC read) against the same window tables and evaluates the mirrored SHD
collapses.  Verified: every one of the four strand constructions maps to
its exact planted position; the directional mode keeps ignoring the PBAT
strands; STEP 2's mirrored fine alignment is device==host-exact.
"""

import numpy as np
import pytest

from hashreadmapper_tpu.config import ProgramOptions
from hashreadmapper_tpu.io.genome import Genome
from hashreadmapper_tpu.io.readstore import ReadStorage, pack_rows
from hashreadmapper_tpu.pipeline import mapping
from hashreadmapper_tpu.pipeline.engine import CoarseMapper


def four_strand_reads(rng, chrom_bases, n_per, read_len=80, conv=0.9):
    """(reads, lengths, starts, kind) with kind 0..3 =
    dir-fwd, dir-rc, pbat-fwd, pbat-rc; conversion applied in READ space."""
    g_len = len(chrom_bases)
    starts = rng.integers(0, g_len - read_len, size=4 * n_per)
    frag = chrom_bases[starts[:, None] + np.arange(read_len)[None, :]].copy()
    kind = np.repeat(np.arange(4), n_per)
    reads = frag.copy()
    rc_rows = (kind == 1) | (kind == 3)
    reads[rc_rows] = 3 - reads[rc_rows][:, ::-1]
    ct_rows = kind < 2
    c_conv = (reads == 1) & (rng.random(reads.shape) < conv) & ct_rows[:, None]
    g_conv = (reads == 2) & (rng.random(reads.shape) < conv) & ~ct_rows[:, None]
    reads[c_conv] = 3
    reads[g_conv] = 0
    lengths = np.full(4 * n_per, read_len, dtype=np.int32)
    return reads.astype(np.int8), lengths, starts, kind


def make_opts(undirectional):
    return ProgramOptions(
        kmer_length=16, num_hash_functions=8, window_size=128,
        min_table_hits=2, batchsize=128, max_hamming_percent=0.05,
        probe_cap=16, candidates_per_read_cap=16, max_read_length=96,
        three_n_seeding=True, undirectional=undirectional)


def test_four_strands_map_exact():
    rng = np.random.default_rng(77)
    chrom_bases = rng.integers(0, 4, size=150_000, dtype=np.int8)
    genome = Genome(["chrU"], ["".join(np.array(list("ACGT"))[chrom_bases])])
    reads, lengths, starts, kind = four_strand_reads(rng, chrom_bases, 64)

    res_dir = CoarseMapper(genome, make_opts(False)).map_reads(
        reads.copy(), lengths.copy())
    res_und = CoarseMapper(genome, make_opts(True)).map_reads(
        reads.copy(), lengths.copy())

    mapped_d = res_dir.orientation != 3
    mapped_u = res_und.orientation != 3
    # directional: the two PBAT strands stay invisible
    assert mapped_d[kind < 2].mean() > 0.9
    assert mapped_d[kind >= 2].mean() < 0.1
    # undirectional: all four strands map at the directional modes' own
    # per-strand rate (~89% at 90% conversion with F=8/k=16 seeding)
    for k in range(4):
        assert mapped_u[kind == k].mean() > 0.85, f"strand kind {k}"
    # and nothing directional regresses beyond vote-cap noise
    assert mapped_u[kind < 2].sum() >= mapped_d[kind < 2].sum() - 2
    # exact window positions for every mapped read
    stride = 128 - 16 + 1
    for i in np.nonzero(mapped_u)[0]:
        lo = res_und.position[i] - 96
        hi = res_und.position[i] + 128
        assert lo <= starts[i] < hi, (i, kind[i])
    # strand labels: PBAT kinds carry bs_strand=1, directional 0
    bs = res_und.bs_strand
    assert (bs[mapped_u & (kind < 2)] == 0).all()
    assert (bs[mapped_u & (kind >= 2)] == 1).mean() > 0.95
    # orientation: fwd kinds forward, rc kinds reverse
    assert (res_und.orientation[mapped_u & (kind == 2)] == 1).all()
    assert (res_und.orientation[mapped_u & (kind == 3)] == 2).all()


def test_undirectional_step2_device_matches_host():
    rng = np.random.default_rng(79)
    chrom_bases = rng.integers(0, 4, size=120_000, dtype=np.int8)
    genome = Genome(["chrU"], ["".join(np.array(list("ACGT"))[chrom_bases])])
    genome_rc = genome.reverse_complement()
    reads, lengths, starts, kind = four_strand_reads(rng, chrom_bases, 32)
    opts = make_opts(True)
    opts.threads = 2
    res = CoarseMapper(genome, opts).map_reads(reads.copy(), lengths.copy())

    store = ReadStorage(pack_rows(reads, lengths, (80 + 15) // 16),
                        lengths, np.zeros(len(lengths), bool))
    # run_cssw masks the mirrored treatment to FORWARD PBAT reads (RC PBAT
    # reads' conversions are C->T in query space); apply the same mask when
    # driving the internals directly
    strand2 = ((res.bs_strand != 0)
               & (res.orientation == mapping.FORWARD)).astype(np.int8)
    dev = mapping._run_cssw_device(
        genome, genome_rc, res.orientation, res.position.astype(np.int64),
        res.chromosome_id, store, opts, strand2)
    host = mapping._run_cssw_host(
        genome, genome_rc, res.orientation, res.position.astype(np.int64),
        res.chromosome_id, store, opts, strand2)
    n_checked = 0
    for a, b in zip(dev, host):
        assert a.flag == b.flag and a.flag_rc == b.flag_rc
        assert a.num_conversions == b.num_conversions
        for x, y in zip(a.alignments, b.alignments):
            assert x.sw_score == y.sw_score, a.read_id
            assert x.cigar_string == y.cigar_string, a.read_id
        if not (a.flag & 0x4):
            n_checked += 1
    assert n_checked > 64
    # PBAT reads fine-align as well as directional ones: same rate of
    # match-dominated winning CIGARs (window-boundary reads soft-clip in
    # both populations alike)
    from hashreadmapper_tpu.io.vcf import parse_cigar

    def match70_rate(pred):
        good = tot = 0
        for a in dev:
            if a.flag & 0x4 or not pred(kind[a.read_id]):
                continue
            ali = a.alignments[0] if (a.alignments[0].sw_score
                                      >= a.alignments[1].sw_score) else \
                a.alignments[1]
            ops = {}
            for op, ln in parse_cigar(ali.cigar_string):
                ops[op] = ops.get(op, 0) + ln
            tot += 1
            good += ops.get("=", 0) >= 70
        return good, tot

    g_dir, t_dir = match70_rate(lambda k: k < 2)
    g_pb, t_pb = match70_rate(lambda k: k >= 2)
    assert t_pb > 32 and t_dir > 32
    assert g_pb / t_pb >= g_dir / t_dir - 0.1, (g_pb, t_pb, g_dir, t_dir)


def test_undirectional_e2e_sam(tmp_path):
    """Driver end-to-end with --undirectional: PBAT reads reach the SAM."""
    import gzip
    from hashreadmapper_tpu.pipeline.driver import run_pipeline

    rng = np.random.default_rng(81)
    chrom_bases = rng.integers(0, 4, size=60_000, dtype=np.int8)
    chrom = "".join(np.array(list("ACGT"))[chrom_bases])
    fa = tmp_path / "g.fa"
    fa.write_text(">chrU\n" + "\n".join(
        chrom[i:i + 70] for i in range(0, len(chrom), 70)) + "\n")
    reads, lengths, starts, kind = four_strand_reads(rng, chrom_bases, 24)
    fq = tmp_path / "r.fq.gz"
    b2c = np.array(list("ACGT"))
    with gzip.open(fq, "wt") as f:
        for i in range(len(lengths)):
            f.write(f"@r{i}\n{''.join(b2c[reads[i]])}\n+\n{'I'*80}\n")
    opts = ProgramOptions(
        inputfiles=[str(fq)], genomefile=str(fa),
        outputfile=str(tmp_path / "out"),
        kmer_length=16, num_hash_functions=8, window_size=128,
        min_table_hits=2, batchsize=96, max_hamming_percent=0.05,
        probe_cap=8, candidates_per_read_cap=8, max_read_length=96,
        three_n_seeding=True, undirectional=True,
        step2_pipeline_chunk=32)
    run_pipeline(opts)
    mapped = 0
    for line in open(str(tmp_path / "out") + ".SAM"):
        f = line.split("\t")
        if f[0].isdigit() and not (int(f[1]) & 4):
            mapped += 1
    assert mapped > 0.85 * len(lengths)


def test_undirectional_region_sharded():
    """Region-sharded mapping carries the bs_strand label through the
    cross-region merge and matches the single-mapper results."""
    from hashreadmapper_tpu.parallel.region_sharded import RegionShardedMapper

    rng = np.random.default_rng(83)
    chroms = [rng.integers(0, 4, size=60_000, dtype=np.int8)
              for _ in range(2)]
    genome = Genome(["c0", "c1"],
                    ["".join(np.array(list("ACGT"))[c]) for c in chroms])
    cat = np.concatenate(chroms)
    reads, lengths, starts, kind = four_strand_reads(rng, cat, 24)
    opts = make_opts(True)

    single = CoarseMapper(genome, opts).map_reads(
        reads.copy(), lengths.copy(), emulate_read_key_drop=False)
    region = RegionShardedMapper(genome, opts, 4,
                                 partition="window").map_reads(
        reads.copy(), lengths.copy())
    np.testing.assert_array_equal(region.orientation, single.orientation)
    mapped = single.orientation != 3
    np.testing.assert_array_equal(region.position[mapped],
                                  single.position[mapped])
    np.testing.assert_array_equal(region.bs_strand[mapped],
                                  single.bs_strand[mapped])
    assert (region.bs_strand[mapped & (kind >= 2)] == 1).mean() > 0.9


def test_undirectional_sharded_matches_single():
    """Undirectional mode over the (data x table) mesh == single device."""
    import jax
    from hashreadmapper_tpu.parallel.sharded import (ShardedCoarseMapper,
                                                     make_mesh)
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    rng = np.random.default_rng(85)
    chrom_bases = rng.integers(0, 4, size=30_000, dtype=np.int8)
    genome = Genome(["cS"], ["".join(np.array(list("ACGT"))[chrom_bases])])
    reads, lengths, starts, kind = four_strand_reads(
        rng, chrom_bases, 16, read_len=40)
    opts = ProgramOptions(
        kmer_length=12, num_hash_functions=8, window_size=64,
        min_table_hits=2, batchsize=16, max_hamming_percent=0.1,
        probe_cap=16, candidates_per_read_cap=16, max_read_length=48,
        three_n_seeding=True, undirectional=True)
    want = CoarseMapper(genome, opts).map_reads(
        reads.copy(), lengths.copy())
    sharded = ShardedCoarseMapper(genome, opts, make_mesh(2, 4))
    got = sharded.map_reads(reads.copy(), lengths.copy())
    np.testing.assert_array_equal(got.orientation, want.orientation)
    mapped = want.orientation != 3
    np.testing.assert_array_equal(got.hamming[mapped], want.hamming[mapped])
    np.testing.assert_array_equal(got.position[mapped],
                                  want.position[mapped])
    # the mesh reports the PBAT strand space per read (STEP 2 needs it
    # for the mirrored rescoring)
    np.testing.assert_array_equal(got.bs_strand, want.bs_strand)
    # the mesh mapped the PBAT strands too
    assert mapped[kind >= 2].mean() > 0.8


def test_undirectional_window_stream_matches_engine():
    """Reference-orientation (window-stream) undirectional mode == the
    inverted engine on four-strand reads."""
    from hashreadmapper_tpu.pipeline.window_stream import WindowStreamMapper

    rng = np.random.default_rng(87)
    chrom_bases = rng.integers(0, 4, size=40_000, dtype=np.int8)
    genome = Genome(["cW"], ["".join(np.array(list("ACGT"))[chrom_bases])])
    reads, lengths, starts, kind = four_strand_reads(
        rng, chrom_bases, 16, read_len=48)
    opts = ProgramOptions(
        kmer_length=12, num_hash_functions=8, window_size=64,
        min_table_hits=2, batchsize=64, max_hamming_percent=0.1,
        probe_cap=16, candidates_per_read_cap=16, max_read_length=64,
        three_n_seeding=True, undirectional=True)
    eng = CoarseMapper(genome, opts).map_reads(reads.copy(), lengths.copy())
    ws = WindowStreamMapper(reads.copy(), lengths.copy(), opts).map_genome(
        genome)
    np.testing.assert_array_equal(ws.orientation, eng.orientation)
    mapped = eng.orientation != 3
    np.testing.assert_array_equal(ws.hamming[mapped], eng.hamming[mapped])
    np.testing.assert_array_equal(ws.position[mapped], eng.position[mapped])
    np.testing.assert_array_equal(ws.bs_strand[mapped],
                                  eng.bs_strand[mapped])
    assert mapped[kind >= 2].mean() > 0.8
