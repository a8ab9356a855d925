"""Worker process for the 2-process jax.distributed multi-host test.

Each process owns 2 virtual CPU devices (= 2 genome regions of a 4-region
window partition), maps the full replicated read set against its regions,
and merges results across processes with the region-mesh collective
(parallel/multihost.py::merge_region_results).  Every process then checks
the merged results against a single-process whole-genome mapper computed
locally, and prints MULTIHOST_OK on success.

Run by tests/test_multihost.py; usage:
    python multihost_worker.py <process_id> <num_processes> <coordinator>
"""

import os
import sys

pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from hashreadmapper_tpu.parallel import multihost  # noqa: E402

multihost.initialize(coord, nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
n_global_devices = len(jax.devices())
assert n_global_devices == 2 * nproc, jax.devices()

import random  # noqa: E402

from hashreadmapper_tpu.config import ProgramOptions  # noqa: E402
from hashreadmapper_tpu.cpu import oracle  # noqa: E402
from hashreadmapper_tpu.io.genome import Genome  # noqa: E402
from hashreadmapper_tpu.parallel.region_sharded import (  # noqa: E402
    region_key_payload)
from hashreadmapper_tpu.parallel.segments import partition_windows  # noqa: E402
from hashreadmapper_tpu.pipeline.engine import CoarseMapper  # noqa: E402

# --- deterministic dataset (identical on every process) ---
rng = random.Random(99)
chroms = ["".join(rng.choice("ACGT") for _ in range(n))
          for n in (700, 450, 350)]
genome = Genome([f"c{i}" for i in range(len(chroms))], chroms)
n_reads, maxlen = 64, 36
reads = []
for _ in range(n_reads):
    rl = rng.randint(14, maxlen)
    if rng.random() < 0.9:
        c = rng.randrange(len(chroms))
        s = rng.randrange(len(chroms[c]) - rl)
        b = oracle.encode_bases(chroms[c][s:s + rl])
        if rng.random() < 0.5:
            b = oracle.revcomp_bases(b)
    else:
        b = [rng.randrange(4) for _ in range(rl)]
    reads.append(b)
bases = np.zeros((n_reads, maxlen), dtype=np.int8)
lens = np.zeros(n_reads, dtype=np.int32)
for i, r in enumerate(reads):
    bases[i, :len(r)] = r
    lens[i] = len(r)

opts = ProgramOptions(
    kmer_length=8, num_hash_functions=8, window_size=32,
    min_table_hits=2, batchsize=32, max_hamming_percent=0.15,
    probe_cap=64, candidates_per_read_cap=32, max_read_length=maxlen)

# --- region assignment: one region per GLOBAL device ---
regions = partition_windows(genome, opts, n_global_devices)
chrom_gwin_base = np.zeros(genome.num_chromosomes, dtype=np.int64)
t = 0
for c in range(genome.num_chromosomes):
    chrom_gwin_base[c] = t
    t += genome.num_windows_in_chromosome(
        c, opts.kmer_length, opts.window_size)

mesh = multihost.region_mesh()
global_devs = list(jax.devices())
local_keys, local_payloads = [], []
for d in mesh.local_devices:
    gidx = global_devs.index(d)
    with jax.default_device(d):
        mapper = CoarseMapper(genome, opts, segments=regions[gidx])
        mapper.ensure_empty_drops()
        ab, al, av, n_pad = mapper.stage_reads_device(bases, lens)
        packed_dev, _, _ = mapper._map_reads_device(
            ab, al, av, n_pad, opts.batchsize)
    packed = np.asarray(packed_dev)[:n_reads]
    key, payload, _ = region_key_payload(mapper, packed, chrom_gwin_base)
    local_keys.append(key)
    local_payloads.append(payload)

merged_key, merged_payload = multihost.merge_region_results(
    mesh, local_keys, local_payloads)

# --- verify against the single-process whole-genome mapper ---
single = CoarseMapper(genome, opts).map_reads(
    bases, lens, emulate_read_key_drop=False)
mapped = single.orientation != 3
expect_key = np.where(
    mapped,
    (single.hamming.astype(np.int64) << 40)
    + single.global_window_id.astype(np.int64),
    np.int64(2**62))
assert mapped.sum() >= 0.7 * n_reads, f"only {mapped.sum()} mapped"
np.testing.assert_array_equal(merged_key, expect_key)
np.testing.assert_array_equal(merged_payload[mapped, 0],
                              single.orientation[mapped])
np.testing.assert_array_equal(merged_payload[mapped, 1],
                              single.hamming[mapped])
np.testing.assert_array_equal(merged_payload[mapped, 2],
                              single.shift[mapped])
np.testing.assert_array_equal(merged_payload[mapped, 3],
                              single.chromosome_id[mapped])
np.testing.assert_array_equal(merged_payload[mapped, 4],
                              single.position[mapped])
print(f"MULTIHOST_OK {pid}", flush=True)
