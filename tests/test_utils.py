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
