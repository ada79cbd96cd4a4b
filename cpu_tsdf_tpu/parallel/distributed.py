"""Multi-host (multi-process) distributed runtime.

The reference's parallel ceiling is one shared-memory machine (OpenMP
`#pragma omp parallel for`, e.g. /root/reference/src/lib/tsdf_volume_octree.cpp:214,290,435).
The TPU-native replacement is JAX's multi-controller SPMD runtime:

  * every host process calls :func:`initialize` (jax.distributed) once at
    startup; after that `jax.devices()` is the GLOBAL device list and any
    jitted computation over a global `Mesh` runs as one SPMD program with XLA
    collectives riding ICI within a slice and DCN across slices;
  * :func:`make_mesh` builds the mesh. For a single axis the brick-slab
    layout of :mod:`cpu_tsdf_tpu.parallel.bricks` applies unchanged — device
    d owns X-slab d, whether d is local or on another host. For pod-scale
    runs, :func:`make_hybrid_mesh` keeps a separate DCN axis so the slab axis
    can be pinned to ICI (slab neighbors exchange halos; DCN only ever sees
    the replicated per-frame inputs, which is the cheap direction);
  * host-local frame data (depth images, poses) is replicated into the
    global mesh with :func:`replicate_to_mesh` — every process feeds its
    local shard view, jax.make_array_from_process_local_data assembles the
    global array without any host gathering.

Single-process sessions work unchanged: :func:`initialize` is a no-op unless
multi-process environment variables / arguments are present, and every mesh
helper falls back to the local devices.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import AXIS

DCN_AXIS = "dcn"

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> bool:
    """Bring up the multi-controller runtime (jax.distributed.initialize).

    Arguments default to the standard environment variables
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the
    cloud-TPU auto-detection built into jax.distributed). Returns True when
    a multi-process runtime was started, False for single-process runs.
    Idempotent: repeated calls are no-ops.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # cloud-TPU pods advertise their topology in the environment;
        # jax.distributed.initialize() with no args auto-detects there. Only
        # attempt it when a pod signal is present — unconditionally calling
        # it on single-host sessions raises (and could stall probing
        # metadata servers on machines that merely look cloud-like).
        pod_env = ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS",
                   "CLOUD_TPU_TASK_ID", "TPU_WORKER_ID")
        if not any(os.environ.get(k) for k in pod_env):
            return False  # single-process session
        jax.distributed.initialize()
        _initialized = True
        return True
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    _initialized = True
    return True


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1D global mesh over every device of every process (slab axis)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


def make_hybrid_mesh(ici_per_host: Optional[int] = None,
                     devices: Optional[Sequence] = None) -> Mesh:
    """2D (dcn, shard) mesh: the slab axis stays inside each host/slice (ICI),
    the outer axis crosses hosts (DCN).

    With D local devices per process and P processes the mesh is [P, D]; a
    brick volume sharded P(None, AXIS) keeps every slab exchange on ICI while
    P(DCN_AXIS) distributes independent work (e.g. frames of different
    sensors) across hosts.

    `devices` selects which backend's devices form the mesh (defaults to the
    default backend's). The process count is derived from the devices
    themselves, NOT from jax.process_count(): on machines where a
    single-process accelerator plugin owns the default backend, the
    multi-process CPU mesh would otherwise collapse to one process.
    """
    if devices is None:
        devices = jax.devices()
    devs = sorted(devices, key=lambda d: (d.process_index, d.id))
    nproc = len({d.process_index for d in devs})
    if nproc == 1:
        return Mesh(np.asarray(devs).reshape(1, len(devs)), (DCN_AXIS, AXIS))
    if ici_per_host is None:
        ici_per_host = len(devs) // nproc
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (ici_per_host,), (nproc,), devices=devs)
        # create_hybrid_device_mesh returns [dcn, ici]
        return Mesh(arr.reshape(nproc, ici_per_host), (DCN_AXIS, AXIS))
    except Exception:
        # deterministic fallback: sort global devices by (process, id)
        arr = np.asarray(devs).reshape(nproc, ici_per_host)
        return Mesh(arr, (DCN_AXIS, AXIS))


def _mesh_process_count(mesh: Mesh) -> int:
    """Number of distinct processes owning the mesh's devices (NOT
    jax.process_count(), which reports the DEFAULT backend's and misleads
    when a single-process accelerator plugin owns that backend)."""
    return len({d.process_index for d in mesh.devices.flat})


def replicate_to_mesh(x, mesh: Mesh):
    """Replicate process-local host data onto every device of a (possibly
    multi-process) mesh without host-side gathering."""
    x = np.asarray(x)
    sharding = NamedSharding(mesh, P())
    if _mesh_process_count(mesh) == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, x)


def shard_to_mesh(x, mesh: Mesh, spec: P):
    """Place a GLOBAL host array onto the mesh with `spec`. Every process
    passes the same full array; only the locally-addressable shards are
    transferred on each host."""
    x = np.asarray(x)
    sharding = NamedSharding(mesh, spec)
    if _mesh_process_count(mesh) == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_callback(
        x.shape, sharding, lambda idx: x[idx])
