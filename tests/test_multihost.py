"""Real multi-host exercise: 2 jax.distributed processes over localhost.

Spawns two worker processes (tests/multihost_worker.py), each owning 2
virtual CPU devices = 2 genome regions; the workers map a replicated read
set against their regions and merge with the region-mesh collective
(pmin/pmax over DCN — here the local TCP coordinator).  Both workers
assert their merged results equal a single-process whole-genome mapper's.

This exercises actual process-spanning meshes — the piece the reference
never had (its multi-GPU layer is single-process CUDA P2P,
include/gpu/multigpuminhasher.cuh:391-483) and the virtual 8-device
single-process tests cannot cover.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_region_merge():
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"MULTIHOST_OK {pid}" in out, out[-4000:]
