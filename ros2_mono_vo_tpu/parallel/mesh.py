"""Device-mesh construction for the distributed backend.

The reference has no distributed layer (SURVEY.md section 2); this is the
TPU-native equivalent prescribed by BASELINE.json: jax.sharding.Mesh over
ICI/DCN with XLA collectives — no NCCL/MPI analog needed.

Axis naming:
  "obs"  — observation/data parallelism for BA normal-equation assembly
           (reduction parallelism: psum of H/W/b blocks).
  "hyp"  — hypothesis parallelism for RANSAC fan-out (embarrassingly
           parallel, no collectives inside scoring).
"""

from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh, PartitionSpec, NamedSharding

OBS_AXIS = "obs"
HYP_AXIS = "hyp"
# landmark/model parallelism: each device owns a landmark shard + the
# observations touching it (parallel/dist_ba.py landmark_sharded_*)
LM_AXIS = "lm"
# inter-host axis: collectives crossing it ride DCN (data-center network),
# orders of magnitude lower bandwidth than ICI — shardings lay out so the
# big reductions stay inside "lm" (ICI) and only the tiny reduced camera
# system crosses "dcn" (SURVEY.md section 5 inter-slice prescription)
DCN_AXIS = "dcn"


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Multi-host wiring: `jax.distributed.initialize` from explicit args or
    the standard env (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID; on real TPU pods the TPU metadata server supplies these
    and initialize() needs no arguments).

    Returns True if a multi-process runtime was initialized. Safe to call
    in single-process runs (no-op, returns False)."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid = os.environ.get("JAX_PROCESS_ID")
        process_id = int(pid) if pid is not None else None
    if coordinator is None and num_processes is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def make_mesh(n_devices: int | None = None, axis: str = OBS_AXIS) -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_pod_mesh(axis: str = LM_AXIS) -> Mesh:
    """2-D ("dcn", axis) mesh for a multi-host pod slice: the leading axis
    spans processes (hosts — collectives crossing it ride DCN), the trailing
    axis spans each host's local devices (ICI). Single-process runs get a
    (1, n_local) mesh, so code written against this shape runs anywhere.

    Device order: jax.devices() groups by process; reshaping to
    (n_procs, n_local) puts each host's devices contiguous on the trailing
    (ICI) axis — the layout hierarchical psum(axis) -> psum("dcn") wants."""
    devs = jax.devices()
    n_procs = max(jax.process_count(), 1)
    n_local = len(devs) // n_procs
    grid = np.empty((n_procs, n_local), dtype=object)
    by_proc: dict[int, list] = {}
    for d in devs:
        by_proc.setdefault(d.process_index, []).append(d)
    for p, ds in sorted(by_proc.items()):
        for j, d in enumerate(sorted(ds, key=lambda x: x.id)):
            grid[p, j] = d
    return Mesh(grid, (DCN_AXIS, axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def sharded_along(mesh: Mesh, axis_name: str, dim: int, ndim: int) -> NamedSharding:
    spec = [None] * ndim
    spec[dim] = axis_name
    return NamedSharding(mesh, PartitionSpec(*spec))
