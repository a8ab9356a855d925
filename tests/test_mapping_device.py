"""Device STEP-2 path (_run_cssw_device) vs the serial host oracle.

Must be bit-identical through SAM + VCF: same alignments, same rescoring,
same byte output."""

import random

import numpy as np
import pytest

from hashreadmapper_tpu import native
from hashreadmapper_tpu.config import ProgramOptions
from hashreadmapper_tpu.io.genome import Genome
from hashreadmapper_tpu.io.readstore import ReadStorage, pack_rows
from hashreadmapper_tpu.pipeline import mapping

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _setup(seed=3, n_reads=80, chrom_len=5000, bs_rate=0.25):
    rng = random.Random(seed)
    nprng = np.random.default_rng(seed)
    chroms = ["".join(rng.choice("ACGT") for _ in range(chrom_len)),
              "".join(rng.choice("ACGNT") for _ in range(901))]
    genome = Genome(["chrA", "chrB x"], chroms)
    genome_rc = genome.reverse_complement()

    code = {"A": 0, "C": 1, "G": 2, "T": 3, "N": 0}
    reads, lengths = [], []
    orientation = np.zeros(n_reads, np.int8)
    position = np.zeros(n_reads, np.int64)
    chromosome_id = np.zeros(n_reads, np.int32)
    for i in range(n_reads):
        rl = rng.choice([40, 60, 100, 101, 128])
        c = rng.randrange(2)
        size = len(chroms[c])
        start = rng.randrange(0, size - rl)
        seq = [("T" if (ch == "C" and rng.random() < bs_rate) else ch)
               for ch in chroms[c][start:start + rl]]
        # some substitutions + junk reads
        if i % 7 == 0:
            seq = [rng.choice("ACGT") for _ in range(rl)]
        bases = [code[ch] for ch in seq]
        rc = rng.random() < 0.5
        if rc:
            bases = [3 - b for b in reversed(bases)]
        reads.append(bases)
        lengths.append(rl)
        # coarse result: window start near the true position (incl. edge
        # windows at 0 and near the chromosome end)
        wpos = max(0, min(start - rng.randrange(0, 20), size - 1))
        if i % 11 == 0:
            wpos = size - rng.randrange(1, 130)   # end-of-chromosome window
        if i % 13 == 0:
            orientation[i] = mapping.NONE         # unmapped
        else:
            orientation[i] = (mapping.REVERSE_COMPLEMENT if rc
                              else mapping.FORWARD)
        position[i] = wpos
        chromosome_id[i] = c

    maxlen = max(lengths)
    mat = np.zeros((n_reads, maxlen), np.uint8)
    for i, b in enumerate(reads):
        mat[i, :len(b)] = b
    packed = pack_rows(mat, np.asarray(lengths, np.int32), (maxlen + 15) // 16)
    store = ReadStorage(packed, np.asarray(lengths, np.int32),
                        np.zeros(n_reads, bool))
    opts = ProgramOptions(window_size=128, threads=2, max_read_length=128)
    return genome, genome_rc, orientation, position, chromosome_id, store, opts


def _alignment_tuple(al):
    return (al.sw_score, al.sw_score_next_best, al.ref_begin, al.ref_end,
            al.query_begin, al.query_end, al.ref_end_next_best,
            al.mismatches, al.cigar_string, al.flag)


def test_device_path_bit_identical(tmp_path):
    genome, genome_rc, ori, pos, chrom, store, opts = _setup()
    host = mapping._run_cssw_host(genome, genome_rc, ori, pos, chrom,
                                  store, opts)
    dev = mapping._run_cssw_device(genome, genome_rc, ori, pos, chrom,
                                   store, opts)
    assert len(host) == len(dev)
    for h, d in zip(host, dev):
        assert h.query == d.query, h.read_id
        assert h.rc_query == d.rc_query, h.read_id
        assert h.three_n_query == d.three_n_query, h.read_id
        assert h.three_n_rc_query == d.three_n_rc_query, h.read_id
        assert h.ref == d.ref, h.read_id
        assert h.rc_ref == d.rc_ref, h.read_id
        assert h.three_n_ref == d.three_n_ref, h.read_id
        assert h.window_length == d.window_length
        assert h.mask_len == d.mask_len
        assert h.flag == d.flag, h.read_id
        assert h.flag_rc == d.flag_rc, h.read_id
        assert h.num_conversions == d.num_conversions, h.read_id
        for k in range(2):
            assert _alignment_tuple(h.alignments[k]) == \
                _alignment_tuple(d.alignments[k]), (h.read_id, k)

    # byte-identical SAM + VCF
    p1 = str(tmp_path / "host.sam")
    p2 = str(tmp_path / "dev.sam")
    s1 = mapping.print_to_sam(host, genome, p1)
    s2 = mapping.print_to_sam(dev, genome, p2)
    assert s1 == s2
    assert open(p1).read() == open(p2).read()
    v1 = mapping.do_vc(host, genome, str(tmp_path / "host"))
    v2 = mapping.do_vc(dev, genome, str(tmp_path / "dev"))
    assert open(v1).read() == open(v2).read()


def test_dispatcher_uses_device(monkeypatch):
    genome, genome_rc, ori, pos, chrom, store, opts = _setup(seed=9,
                                                             n_reads=12)
    called = {}
    real = mapping._run_cssw_device

    def spy(*a, **kw):
        called["yes"] = True
        return real(*a, **kw)

    monkeypatch.setattr(mapping, "_run_cssw_device", spy)
    out = mapping.run_cssw(genome, genome_rc, ori, pos, chrom, store, opts)
    assert called.get("yes")
    assert len(out) == 12

    opts.step2_device = False
    called.clear()
    out2 = mapping.run_cssw(genome, genome_rc, ori, pos, chrom, store, opts)
    assert not called
    for h, d in zip(out2, out):
        for k in range(2):
            assert _alignment_tuple(h.alignments[k]) == \
                _alignment_tuple(d.alignments[k])


def test_python_fallback_rescore_distinct_conversions(monkeypatch):
    """Regression: when libhrm_native.so lacks hrm_rescore_batch, the
    Python-fallback rescore must not write every read's num_conversions
    into one shared list (build_out's default_conv)."""
    genome, genome_rc, ori, pos, chrom, store, opts = _setup(seed=5,
                                                             n_reads=40)
    host = mapping._run_cssw_host(genome, genome_rc, ori, pos, chrom,
                                  store, opts)

    real_lib = native.get_lib()

    class HideRescore:
        """Forwards to the real lib but hides hrm_rescore_batch."""
        def __getattr__(self, name):
            if name == "hrm_rescore_batch":
                raise AttributeError(name)
            return getattr(real_lib, name)

    monkeypatch.setattr(native, "get_lib", lambda: HideRescore())
    dev = mapping._run_cssw_device(genome, genome_rc, ori, pos, chrom,
                                   store, opts)
    mapped = [(h, d) for h, d in zip(host, dev) if not (h.flag & 0x4)]
    assert len({id(d.num_conversions) for _, d in mapped}) == len(mapped)
    for h, d in mapped:
        assert h.num_conversions == d.num_conversions, h.read_id


def test_small_chunk_padding():
    """Chunk padding (dummy pairs) must not contaminate results."""
    genome, genome_rc, ori, pos, chrom, store, opts = _setup(seed=21,
                                                             n_reads=17)
    opts.step2_pair_chunk = 256   # forces padded final chunk
    host = mapping._run_cssw_host(genome, genome_rc, ori, pos, chrom,
                                  store, opts)
    dev = mapping._run_cssw_device(genome, genome_rc, ori, pos, chrom,
                                   store, opts)
    for h, d in zip(host, dev):
        for k in range(2):
            assert _alignment_tuple(h.alignments[k]) == \
                _alignment_tuple(d.alignments[k]), (h.read_id, k)
