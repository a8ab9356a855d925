"""Phase timers (reference: helpers::CpuTimer, hpc_helpers timers.cuh:11-104).

Prints "TIMING: <seconds> s : <label>" like the reference's CpuTimer::print,
and integrates with jax.profiler named scopes when tracing.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Tuple


class PhaseTimers:
    def __init__(self) -> None:
        self._totals: List[Tuple[str, float]] = []

    @contextlib.contextmanager
    def phase(self, label: str):
        # every driver phase doubles as a profiler scope (the reference
        # wraps each stage in an nvtx range alongside its CpuTimer,
        # main_gpu.cu:484-775 + timers.cuh) — visible in xprof traces
        # captured via utils.tracing.trace_session
        from .tracing import scoped_range
        start = time.perf_counter()
        try:
            with scoped_range(label):
                yield
        finally:
            self._totals.append((label, time.perf_counter() - start))

    def totals(self) -> Dict[str, float]:
        return dict(self._totals)

    def print_all(self) -> None:
        for label, seconds in self._totals:
            print(f"TIMING: {seconds:.6f} s : {label}")
