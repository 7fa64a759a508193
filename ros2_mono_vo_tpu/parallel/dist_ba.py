"""Distributed sliding-window bundle adjustment over a device mesh.

BASELINE.json config #5 / SURVEY.md section 7 stage 8: the observation axis
of the window problem is sharded across devices with shard_map; each device
assembles partial normal equations from its observation shard, the blocks
(H_pp, W, H_ll, b_p, b_l) and costs are all-reduced over ICI (psum), and the
small reduced camera solve runs replicated. Communication per LM iteration is
O(M*P*18 + P*9) floats — independent of observation count, the same shape as
a data-parallel gradient all-reduce.

Single-device `bundle_adjust` and this distributed version are checked for
golden agreement in tests/test_distributed.py (SURVEY.md section 4,
"distributed BA matches single-device BA within tolerance").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ros2_mono_vo_tpu.backend.ba import BAProblem, BAResult, lm_loop
from ros2_mono_vo_tpu.parallel.mesh import OBS_AXIS


def _pad_to_multiple(prob: BAProblem, n_shards: int) -> BAProblem:
    """Pad the observation axis so it divides evenly across shards (padding
    is masked out, so results are unchanged)."""
    n = prob.obs_uv.shape[1]
    rem = (-n) % n_shards
    if rem == 0:
        return prob
    pad2 = [(0, 0), (0, rem), (0, 0)]
    return prob._replace(
        obs_uv=jnp.pad(prob.obs_uv, pad2),
        obs_lm=jnp.pad(prob.obs_lm, [(0, 0), (0, rem)], constant_values=-1),
        obs_mask=jnp.pad(prob.obs_mask, [(0, 0), (0, rem)]),
    )


def distributed_bundle_adjust(prob: BAProblem, mesh: Mesh,
                              iterations: int = 10, huber_delta: float = 2.0,
                              lam0: float = 1e-3) -> BAResult:
    """Run LM with the observation axis sharded over `mesh` (axis "obs")."""
    n_shards = mesh.shape[OBS_AXIS]
    prob = _pad_to_multiple(prob, n_shards)

    obs_specs = BAProblem(
        T_cw=P(), lm_xyz=P(),
        obs_uv=P(None, OBS_AXIS, None),
        obs_lm=P(None, OBS_AXIS),
        obs_mask=P(None, OBS_AXIS),
        K=P(), pose_fixed=P())
    out_specs = BAResult(T_cw=P(), lm_xyz=P(), initial_cost=P(),
                         final_cost=P(), iterations=P())

    @functools.partial(jax.jit, static_argnames=())
    @functools.partial(jax.shard_map, mesh=mesh, in_specs=(obs_specs,),
                       out_specs=out_specs)
    def run(p_local: BAProblem) -> BAResult:
        return lm_loop(p_local, iterations, huber_delta, lam0,
                       psum_axis=OBS_AXIS)

    return run(prob)
