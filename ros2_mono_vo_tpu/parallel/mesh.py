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

import numpy as np

import jax
from jax.sharding import Mesh, PartitionSpec, NamedSharding

OBS_AXIS = "obs"
HYP_AXIS = "hyp"
# landmark/model parallelism: each device owns a landmark shard + the
# observations touching it (parallel/dist_ba.py landmark_sharded_*)
LM_AXIS = "lm"


def make_mesh(n_devices: int | None = None, axis: str = OBS_AXIS) -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def sharded_along(mesh: Mesh, axis_name: str, dim: int, ndim: int) -> NamedSharding:
    spec = [None] * ndim
    spec[dim] = axis_name
    return NamedSharding(mesh, PartitionSpec(*spec))
