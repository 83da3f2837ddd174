"""Multi-host bring-up: run the sharded LIO step across processes.

The reference is a single OS process with no distributed layer
(`/root/reference/src/main.cpp`, SURVEY.md §2 parallelism table).  Scaling
past one host on TPU means `jax.distributed`: every host runs this same
program, one process per host, each seeing its local chips; collectives ride
ICI within a slice and DCN across slices.  This module is the thin layer that
makes the single-host `parallel.sharding` / `parallel.map_sharding` steps
multi-host:

- `init_distributed()` — initialize the JAX distributed runtime from explicit
  args or the standard env vars (`COORDINATOR_ADDRESS`, `NUM_PROCESSES`,
  `PROCESS_ID`).  On TPU pods with modern runtimes, `jax.distributed.
  initialize()` autodetects everything — args are only needed off-pod
  (e.g. CPU multi-process tests).
- `global_mesh()` — a 1-D mesh over ALL global devices (local + remote).
- `window_from_local(...)` — each host feeds ONLY the points its own sensors
  produced; `jax.make_array_from_process_local_data` assembles the globally
  point-sharded window without any host ever holding the full batch.  (This
  is the ingest analog of data parallelism: the LiDAR stream is partitioned
  by time/host, and the Gauss-Newton reductions make the update exact
  regardless of which host holds which points.)
- `replicate(...)` — place filter state / map replicated over the mesh from
  host-identical values (every process must pass the same bytes).

Single-process meshes (tests, the driver's virtual-CPU dry run) are the
degenerate case and exercise the same code paths.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import AXIS


# Environment markers whose presence means a multi-process launcher set this
# process up and `jax.distributed.initialize()` can autodetect everything:
# Cloud TPU pod runtime, GKE/JobSet, SLURM, Open MPI (the cluster backends
# jax's ClusterEnv supports as of jax 0.5+).
_POD_ENV_MARKERS = (
    "TPU_WORKER_HOSTNAMES",            # Cloud TPU pod VM metadata
    "TPU_WORKER_ID",
    "MEGASCALE_COORDINATOR_ADDRESS",   # multislice runtime
    "JAX_COORDINATOR_ADDRESS",         # explicit jax cluster env
    "SLURM_JOB_NUM_NODES",
    "OMPI_COMM_WORLD_SIZE",
)


def running_under_cluster_launcher() -> bool:
    """True when a recognized multi-process launcher environment is present
    (so `jax.distributed.initialize()` with no args can autodetect)."""
    return any(m in os.environ for m in _POD_ENV_MARKERS)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    """Initialize `jax.distributed` (idempotent).

    Resolution order per argument: explicit arg → env var
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID) → runtime
    autodetection (TPU pods, SLURM, MPI — `running_under_cluster_launcher`).
    Safe to call in plain single-process runs: with no args, no env vars, and
    no launcher markers it is a no-op.
    """
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])

    if coordinator_address is None and num_processes is None and process_id is None:
        # No explicit rendezvous info.  On a pod/SLURM/MPI launch the runtime
        # autodetects everything from the environment — initialize with no
        # args.  Outside a launcher (CPU unit tests, single-host runs) there
        # is nothing to initialize and calling would raise/hang: no-op.
        if not running_under_cluster_launcher():
            return
        try:
            jax.distributed.initialize()
        except RuntimeError as e:  # already initialized
            if "already" not in str(e).lower():
                raise
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def global_mesh(axis: str = AXIS) -> Mesh:
    """1-D mesh over every device of every process, in process order (so a
    host's local shard of a point-sharded array is exactly what it fed)."""
    return Mesh(np.array(jax.devices()), (axis,))


def window_from_local(
    mesh: Mesh,
    pts_local: np.ndarray,      # (n_local, 3) this process's padded points
    pts_t_local: np.ndarray,    # (n_local,)
    mask_local: np.ndarray,     # (n_local,)
):
    """Assemble the globally point-sharded window from per-process data.

    Every process contributes its local rows; the global arrays are sharded
    over AXIS with no cross-host transfer of point data.  All processes must
    pass the same n_local (pad to the bucket before calling).
    """
    sh = NamedSharding(mesh, P(AXIS))
    mk = lambda a: jax.make_array_from_process_local_data(sh, np.asarray(a))
    return mk(pts_local), mk(pts_t_local), mk(mask_local)


def replicate(mesh: Mesh, tree):
    """Place a pytree replicated over the mesh (all processes pass identical
    values — e.g. the filter state, IMU window, and map).

    Multi-process: `device_put` cannot target non-addressable devices, so the
    global replicated array is assembled from each process's (identical) full
    copy via `make_array_from_process_local_data`."""
    sh = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        mk = lambda a: jax.make_array_from_process_local_data(sh, np.asarray(a))
    else:
        mk = lambda a: jax.device_put(a, sh)
    return jax.tree.map(mk, tree)


def local_point_budget(mesh: Mesh, global_bucket: int) -> int:
    """Rows of a point-sharded (global_bucket, ...) array owned per process.

    The returned quantity is rows-per-PROCESS (what
    `make_array_from_process_local_data` consumes); sharding additionally
    splits each process's rows over its local devices, so the bucket must
    divide evenly at BOTH granularities — a bucket divisible by the process
    count but not by mesh.size would shard raggedly across devices."""
    n_proc = max(jax.process_count(), 1)
    assert global_bucket % n_proc == 0, (
        f"point bucket {global_bucket} must divide the process count {n_proc}"
    )
    assert global_bucket % mesh.size == 0, (
        f"point bucket {global_bucket} must divide the mesh size {mesh.size} "
        f"(devices shard each process's rows further)"
    )
    return global_bucket // n_proc
