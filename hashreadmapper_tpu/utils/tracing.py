"""Profiling scopes and trace capture (NVTX-range equivalent).

The reference wraps every pipeline stage in nvtx ranges
(reference: include/hpc_helpers/include/nvtx_markers.cuh:18-56,
src/gpu/main_gpu.cu:484-775).  Here the same structure maps onto
jax.profiler named scopes (visible in xprof/tensorboard traces) plus an
optional trace-session context manager.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def scoped_range(name: str, color: int = 0):
    """nvtx::ScopedRange equivalent; color accepted for API parity."""
    import jax.profiler

    with jax.profiler.TraceAnnotation(name):
        yield


def annotate(name: str):
    """Decorator version for stage functions."""
    def deco(fn):
        def wrapped(*args, **kwargs):
            with scoped_range(name):
                return fn(*args, **kwargs)
        wrapped.__name__ = getattr(fn, "__name__", name)
        return wrapped
    return deco


@contextlib.contextmanager
def trace_session(logdir: str):
    """Capture a jax.profiler trace for the enclosed region."""
    import jax.profiler

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
