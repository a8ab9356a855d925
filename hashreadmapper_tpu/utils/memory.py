"""Memory accounting (MemoryUsage protocol equivalent).

Reference: include/memorymanagement.hpp (MemoryUsage {host, per-device}),
printDataStructureMemoryUsage (src/gpu/main_gpu.cu:70-83).  Device numbers
come from jax's live-buffer statistics when the backend exposes them.
"""

from __future__ import annotations

import dataclasses
from typing import Dict


@dataclasses.dataclass
class MemoryUsage:
    host: int = 0
    device: Dict[int, int] = dataclasses.field(default_factory=dict)

    def __add__(self, other: "MemoryUsage") -> "MemoryUsage":
        dev = dict(self.device)
        for k, v in other.device.items():
            dev[k] = dev.get(k, 0) + v
        return MemoryUsage(self.host + other.host, dev)


def get_available_host_memory_kb() -> int:
    """Reference: getAvailableMemoryInKB (memorymanagement.hpp)."""
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1])
    except OSError:
        pass
    return 0


def device_memory_stats() -> Dict[int, Dict[str, int]]:
    """Per-device allocator stats (bytes) where the backend reports them."""
    import jax

    out = {}
    for i, d in enumerate(jax.devices()):
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[i] = {
                "bytes_in_use": stats.get("bytes_in_use", 0),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
                "bytes_limit": stats.get("bytes_limit", 0),
            }
    return out


def print_data_structure_memory_usage(name: str, usage: MemoryUsage) -> None:
    """printDataStructureMemoryUsage equivalent (main_gpu.cu:70-83)."""
    mb = 1024.0 * 1024.0
    print(f"{name} memory usage: {usage.host / mb:.3f} MB on host")
    for dev_id, bytes_ in sorted(usage.device.items()):
        print(f"{name} memory usage: {bytes_ / mb:.3f} MB on device {dev_id}")
