"""Utility subsystems: quality store, memory accounting, progress, tracing."""

import numpy as np

from hashreadmapper_tpu.io.quality import QualityStore
from hashreadmapper_tpu.utils import memory, progress, tracing


def test_quality_8bit_roundtrip():
    qs = QualityStore(bits=8)
    q = "IIII!!##FFABC"
    qs.append(q)
    assert qs.get(0) == q


def test_quality_2bit_bins():
    qs = QualityStore(bits=2)
    qs.append("!I5(")  # phreds 0, 40, 20, 7
    out = qs.get(0)
    phred = [ord(c) - 33 for c in out]
    assert phred[0] <= 7       # lowest bin
    assert phred[1] >= 30      # highest bin
    assert 20 <= phred[2] <= 29
    assert phred[3] <= 7
    assert qs.memory_bytes() == 1  # 4 codes * 2 bits packed into one byte


def test_quality_1bit():
    qs = QualityStore(bits=1)
    qs.append("!I")
    out = qs.get(0)
    assert ord(out[0]) - 33 < 30
    assert ord(out[1]) - 33 >= 30


def test_memory_usage():
    a = memory.MemoryUsage(host=100, device={0: 50})
    b = memory.MemoryUsage(host=10, device={0: 5, 1: 7})
    c = a + b
    assert c.host == 110
    assert c.device == {0: 55, 1: 7}
    assert memory.get_available_host_memory_kb() > 0
    memory.print_data_structure_memory_usage("test", c)


def test_progress(capsys):
    p = progress.ProgressReporter(100, "x", enabled=True, min_interval_s=0)
    p.add(50)
    p.add(50)
    p.finish()


def test_tracing_scope():
    with tracing.scoped_range("stage"):
        pass

    @tracing.annotate("fn")
    def f(x):
        return x + 1

    assert f(1) == 2


def test_process_read_slice():
    from hashreadmapper_tpu.parallel.multihost import process_read_slice
    ranges = [process_read_slice(103, 4, p) for p in range(4)]
    assert ranges[0] == (0, 26)
    assert ranges[-1] == (78, 103)
    total = sum(b - a for a, b in ranges)
    assert total == 103


# --- FastaIndex (.fai) ---

def test_fasta_index_build_parse_seek(tmp_path):
    from hashreadmapper_tpu.io.genome import FastaIndex, Genome
    fa = tmp_path / "g.fa"
    seq1 = "ACGTACGTACGTACGTAC"          # 18 bases over 7-col lines
    seq2 = "GGGGCCCCAAAATTTTGGA" * 3     # 57 bases
    fa.write_text(
        ">chr1 some description\n" +
        "\n".join(seq1[i:i + 7] for i in range(0, len(seq1), 7)) + "\n" +
        ">chr2\n" +
        "\n".join(seq2[i:i + 10] for i in range(0, len(seq2), 10)) + "\n")
    idx = FastaIndex.build(str(fa))
    assert idx.names == ["chr1", "chr2"]
    # reference accessors (genome.hpp:61-76)
    assert idx.get_length("chr1") == len(seq1)
    assert idx.get_length(1) == len(seq2)
    assert idx.get_name_index("chr2") == 1
    # seek-load equals full parse
    assert idx.load_sequence(str(fa), "chr1") == seq1
    assert idx.load_sequence(str(fa), 1) == seq2
    # round-trips through the samtools text format
    idx.save(str(fa) + ".fai")
    idx2 = FastaIndex.from_file(str(fa) + ".fai")
    assert [vars(e) for e in idx2.entries] == [vars(e) for e in idx.entries]
    # a genome load cross-checks against the sibling .fai
    g = Genome.from_fasta(str(fa))
    assert g.chromosome_length(0) == len(seq1)


def test_fasta_index_mismatch_detected(tmp_path):
    import pytest
    from hashreadmapper_tpu.io.genome import FastaIndex, Genome
    fa = tmp_path / "g.fa"
    fa.write_text(">c1\nACGTACGT\n")
    idx = FastaIndex.build(str(fa))
    idx.entries[0].length = 999   # corrupt the index
    idx.save(str(fa) + ".fai")
    with pytest.raises(AssertionError):
        Genome.from_fasta(str(fa))
