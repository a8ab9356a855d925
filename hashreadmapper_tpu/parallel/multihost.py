"""Multi-host runtime scaffolding (jax.distributed over DCN).

The reference is strictly single-process multi-GPU (SURVEY.md §2.3: CUDA P2P
only, no MPI/NCCL).  This framework's multi-host story:

  * `initialize()` wraps jax.distributed.initialize — after it, the global
    device set spans all hosts and the meshes in parallel/sharded.py /
    region_sharded.py can be built over `jax.devices()` with ICI inside a
    host and DCN across hosts.
  * reads are partitioned per PROCESS (each host ingests its own shard of
    the input files) with `process_read_slice`; the coarse results are
    per-read and disjoint across hosts in the data-parallel layout, so no
    cross-host merge is needed there.  In the region-sharded layout the
    merge key (hamming, global window id) is associative — a psum-style
    min-reduction over DCN finishes the job.

This module is scaffolding: the single-chip environment here cannot
exercise multiple processes, so initialization is parameter-checked and the
partitioning helpers are unit-tested host-side.
"""

from __future__ import annotations

from typing import Optional, Tuple


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with explicit or env-derived topology."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def process_read_slice(num_reads: int, num_processes: int,
                       process_id: int) -> Tuple[int, int]:
    """Contiguous per-process read range [start, stop).

    Mirrors the even-share row partitioning of the reference's
    MultiGpu2dArray (multigpuarray.cuh:1315-1345) at host granularity."""
    per = (num_reads + num_processes - 1) // num_processes
    start = min(process_id * per, num_reads)
    stop = min(start + per, num_reads)
    return start, stop


def merge_region_results_across_hosts(local_best_key, local_payload, mesh):
    """Cross-host min-reduction of region-sharded results.

    local_best_key: [N] int64 (hamming << 40 | global window id).
    Executes a jax.lax.pmin-equivalent over the 'region' axis when the mesh
    spans processes; single-process fallback returns inputs unchanged."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh is None or "region" not in mesh.axis_names \
            or mesh.shape["region"] == 1:
        return local_best_key, local_payload

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    def reduce_fn(key, payload):
        best = jax.lax.pmin(key, "region")
        is_winner = key == best
        # winner's payload propagated via max over masked payloads
        masked = jnp.where(is_winner[:, None], payload, jnp.int32(-1))
        return best, jax.lax.pmax(masked, "region")

    kwargs = dict(mesh=mesh, in_specs=(P(), P()), out_specs=(P(), P()))
    try:
        fn = shard_map(reduce_fn, check_vma=False, **kwargs)
    except TypeError:
        fn = shard_map(reduce_fn, check_rep=False, **kwargs)
    return fn(local_best_key, local_payload)
