"""Distributed sliding-window bundle adjustment over a device mesh.

BASELINE.json config #5 / SURVEY.md section 7 stage 8. Two shardings:

1. **Landmark-axis sharding** (`landmark_sharded_bundle_adjust`, the
   production path): each device owns a contiguous landmark shard AND the
   observations touching it (host pre-partitions by `obs_lm`). The landmark
   blocks H_ll [P/D, 3, 3], b_l and the coupling W [M, P/D, 6, 3] are
   device-LOCAL — never communicated. Only the reduced camera system is
   all-reduced: psum of (H_pp [M,6,6], b_p [M,6], S_partial [M,M,6,6],
   rhs_partial [M,6], cost) — tens of KB per LM iteration, independent of
   both observation count and landmark count. This is the Schur-complement
   trick as communication topology: landmarks are eliminated locally, the
   wire carries only the camera system (SURVEY.md section 5, "same
   communication shape as ring/all-reduce sequence parallelism").

2. **Observation-axis sharding** (`distributed_bundle_adjust`): simpler
   data-parallel fallback when observations cannot be partitioned by
   landmark (e.g. streaming assembly): every device holds all landmarks and
   psums the full W [M, P, 6, 3] coupling block. Communication is
   O(M*P*18) floats/iteration — fine for small windows, wasteful at scale.

Both are checked for golden agreement with single-device `bundle_adjust` in
tests/test_distributed.py (SURVEY.md section 4, "distributed BA matches
single-device BA within tolerance").
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ros2_mono_vo_tpu.backend.ba import (BAProblem, BAResult, lm_loop,
                                         build_normal_equations, _inv3x3,
                                         _total_cost)
from ros2_mono_vo_tpu.geometry.se3 import se3_exp
from ros2_mono_vo_tpu.parallel.mesh import OBS_AXIS, LM_AXIS


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
        K=P(), pose_fixed=P(),
        lm_fixed=None if prob.lm_fixed is None else P())
    out_specs = BAResult(T_cw=P(), lm_xyz=P(), initial_cost=P(),
                         final_cost=P(), iterations=P())

    @functools.partial(jax.jit, static_argnames=())
    @functools.partial(jax.shard_map, mesh=mesh, in_specs=(obs_specs,),
                       out_specs=out_specs)
    def run(p_local: BAProblem) -> BAResult:
        return lm_loop(p_local, iterations, huber_delta, lam0,
                       psum_axis=OBS_AXIS)

    return run(prob)


# ---------------------------------------------------------------------------
# Landmark-axis sharding (the scalable path)
# ---------------------------------------------------------------------------


def partition_by_landmark(prob: BAProblem, n_shards: int) -> BAProblem:
    """Host-side pre-partitioning: pad the landmark axis to a multiple of
    `n_shards` and reorder each camera's observations so that the columns
    touching landmark shard d are contiguous in block d (shard_map splits
    contiguous blocks). `obs_lm` is remapped to SHARD-LOCAL landmark indices.

    Landmark slots are never permuted — results map back by truncation.
    """
    T_cw, lm_xyz, obs_uv, obs_lm, obs_mask, K, pose_fixed = (
        np.asarray(x) for x in (prob.T_cw, prob.lm_xyz, prob.obs_uv,
                                prob.obs_lm, prob.obs_mask, prob.K,
                                prob.pose_fixed))
    M, N = obs_lm.shape
    Pn = lm_xyz.shape[0]
    P_pad = -(-Pn // n_shards) * n_shards
    p_loc = P_pad // n_shards
    lm_xyz_p = np.zeros((P_pad, 3), lm_xyz.dtype)
    lm_xyz_p[:Pn] = lm_xyz

    ok = obs_mask & (obs_lm >= 0)
    shard = np.where(ok, obs_lm // p_loc, -1)
    # per-(camera, shard) observation counts -> common padded width
    counts = np.zeros((M, n_shards), np.int64)
    for d in range(n_shards):
        counts[:, d] = (shard == d).sum(axis=1)
    n_s = max(int(counts.max()), 1)

    uv_out = np.zeros((M, n_shards * n_s, 2), obs_uv.dtype)
    lm_out = np.full((M, n_shards * n_s), -1, obs_lm.dtype)
    mask_out = np.zeros((M, n_shards * n_s), bool)
    for m in range(M):
        for d in range(n_shards):
            sel = np.nonzero(shard[m] == d)[0]
            k = len(sel)
            off = d * n_s
            uv_out[m, off:off + k] = obs_uv[m, sel]
            lm_out[m, off:off + k] = obs_lm[m, sel] - d * p_loc  # local ids
            mask_out[m, off:off + k] = True

    lm_fixed_p = None
    if prob.lm_fixed is not None:
        lf = np.asarray(prob.lm_fixed)
        lm_fixed_p = np.zeros((P_pad,), bool)
        lm_fixed_p[:Pn] = lf
        lm_fixed_p = jnp.asarray(lm_fixed_p)
    return BAProblem(T_cw=jnp.asarray(T_cw), lm_xyz=jnp.asarray(lm_xyz_p),
                     obs_uv=jnp.asarray(uv_out), obs_lm=jnp.asarray(lm_out),
                     obs_mask=jnp.asarray(mask_out), K=jnp.asarray(K),
                     pose_fixed=jnp.asarray(pose_fixed),
                     lm_fixed=lm_fixed_p)


@functools.partial(jax.jit, static_argnames=("n_shards", "obs_per_shard"))
def partition_by_landmark_device(prob: BAProblem, n_shards: int,
                                 obs_per_shard: int | None = None):
    """Device-resident shard partitioning, so the LIVE engine can feed
    `landmark_sharded_bundle_adjust` at keyframe cadence with NO host
    round-trip (VERDICT round-4 #7 — the host repartition made distributed
    BA a finishing pass only).

    Two deliberate differences vs the host `partition_by_landmark`:
      - ROUND-ROBIN (id % D) landmark sharding, not contiguous blocks:
        window-local landmark ids are dense ranks starting at 0, so
        contiguous blocks would put every real landmark on shard 0; the
        modulo spread balances shards regardless of occupancy. Shard d
        locally owns global ids {j*D + d} at local index j; invert the
        layout with `unpartition_landmarks`.
      - STATIC per-shard observation block width `obs_per_shard` (default
        2*ceil(N/D), capped at N) instead of the host version's dynamic
        max. Overflow is DROPPED (masked) — returned as n_dropped so it
        is observable; round-robin balance makes the 2x headroom ample.
    """
    M, N = prob.obs_lm.shape
    Pn = prob.lm_xyz.shape[0]
    P_pad = -(-Pn // n_shards) * n_shards
    p_loc = P_pad // n_shards
    n_s = obs_per_shard or min(N, 2 * (-(-N // n_shards)))

    ok = prob.obs_mask & (prob.obs_lm >= 0)
    shard = jnp.where(ok, prob.obs_lm % n_shards, n_shards)   # [M, N]
    onehot = (shard[..., None] ==
              jnp.arange(n_shards)).astype(jnp.int32)         # [M, N, D]
    counts = jnp.cumsum(onehot, axis=1)                       # [M, N, D]
    rank = jnp.take_along_axis(
        counts, jnp.clip(shard, 0, n_shards - 1)[..., None], -1)[..., 0] - 1
    dest = jnp.where(ok & (rank < n_s), shard * n_s + rank,
                     n_shards * n_s)                          # drop slot
    rows = jnp.arange(M)[:, None]
    W = n_shards * n_s
    uv_out = jnp.zeros((M, W, 2), prob.obs_uv.dtype).at[rows, dest].set(
        prob.obs_uv, mode="drop")
    lm_local = jnp.where(ok, prob.obs_lm // n_shards, -1)
    lm_out = jnp.full((M, W), -1, prob.obs_lm.dtype).at[rows, dest].set(
        lm_local, mode="drop")
    mask_out = jnp.zeros((M, W), bool).at[rows, dest].set(ok, mode="drop")

    def shard_major(x, fill=0.0):
        xp = jnp.pad(x, ((0, P_pad - Pn),) + ((0, 0),) * (x.ndim - 1),
                     constant_values=fill)
        # [P_pad, ...] global order -> [D * p_loc, ...] shard-major
        return jnp.swapaxes(
            xp.reshape((p_loc, n_shards) + xp.shape[1:]), 0, 1
        ).reshape((P_pad,) + xp.shape[1:])

    lm_xyz_p = shard_major(prob.lm_xyz)
    lm_fixed_p = (None if prob.lm_fixed is None
                  else shard_major(prob.lm_fixed, fill=False))
    n_dropped = (jnp.sum(ok.astype(jnp.int32))
                 - jnp.sum(mask_out.astype(jnp.int32)))
    return BAProblem(T_cw=prob.T_cw, lm_xyz=lm_xyz_p, obs_uv=uv_out,
                     obs_lm=lm_out, obs_mask=mask_out, K=prob.K,
                     pose_fixed=prob.pose_fixed,
                     lm_fixed=lm_fixed_p), n_dropped


@functools.partial(jax.jit, static_argnames=("n_shards", "n_out"))
def unpartition_landmarks(lm_xyz_sharded: jnp.ndarray, n_shards: int,
                          n_out: int) -> jnp.ndarray:
    """Invert partition_by_landmark_device's shard-major landmark layout:
    [D * p_loc, 3] -> global-id order [n_out, 3]."""
    P_pad = lm_xyz_sharded.shape[0]
    p_loc = P_pad // n_shards
    out = jnp.swapaxes(
        lm_xyz_sharded.reshape((n_shards, p_loc) + lm_xyz_sharded.shape[1:]),
        0, 1).reshape((P_pad,) + lm_xyz_sharded.shape[1:])
    return out[:n_out]


def _lm_loop_landmark_sharded(p: BAProblem, iterations: int,
                              huber_delta: float, lam0: float,
                              lam_factor: float,
                              axis: str | tuple[str, ...]) -> BAResult:
    """LM loop body with device-LOCAL landmark blocks.

    `p` is the shard-local problem: lm_xyz [P/D, 3], obs_* [M, N/D] with
    shard-local landmark ids. Only the reduced camera system travels.

    `axis` may be a tuple of mesh axes (e.g. ("dcn", "lm") on a multi-host
    pod slice): psum over the tuple reduces over the flattened group, and
    XLA lowers it hierarchically over the mesh topology — intra-host shards
    reduce over ICI, and only one combined contribution per host crosses
    DCN. The wire payload is the reduced camera system either way
    (M^2*36 floats), independent of landmark and observation counts.
    """
    M = p.T_cw.shape[0]
    eye3 = jnp.eye(3, dtype=p.lm_xyz.dtype)
    eye6 = jnp.eye(6, dtype=p.T_cw.dtype)

    def lm_iter(carry, _):
        T_cw, lm_xyz, lam, _ = carry
        pl = p._replace(T_cw=T_cw, lm_xyz=lm_xyz)
        # local assembly: H_ll, W, b_l never leave the device
        H_pp_l, W, H_ll, b_p_l, b_l, cost_l = build_normal_equations(
            pl, huber_delta, psum_axis=None)
        if p.lm_fixed is not None:       # frozen landmarks (see ba.lm_loop)
            freeL = (~p.lm_fixed).astype(W.dtype)
            W = W * freeL[None, :, None, None]
            b_l = b_l * freeL[:, None]
            H_ll = H_ll * freeL[:, None, None]
        H_pp, b_p, cost = jax.lax.psum((H_pp_l, b_p_l, cost_l), axis)

        # damping (H_pp replicated after psum; H_ll local)
        H_ll_d = H_ll + (lam * jnp.abs(H_ll) * eye3 + 1e-8 * eye3)
        H_pp_d = H_pp + (lam * jnp.abs(H_pp) * eye6 + 1e-8 * eye6)
        Hl_inv = _inv3x3(H_ll_d)

        # broadcast-reduce, not einsum (tiny-batched-matmul trap — see the
        # same line in backend/ba.schur_solve, measured ~20x)
        WHinv = jnp.sum(W[..., :, :, None] * Hl_inv[:, None, :, :], -2)
        S_off_l = -jnp.einsum("mpik,qplk->mqil", WHinv, W)   # [M, M, 6, 6]
        rhs_l = -jnp.einsum("mpik,pk->mi", WHinv, b_l)       # [M, 6]
        # the ONLY large-ish collective: M^2*36 + M*6 floats
        S_off, rhs_lm = jax.lax.psum((S_off_l, rhs_l), axis)
        S = S_off.at[jnp.arange(M), jnp.arange(M)].add(H_pp_d)
        rhs = b_p + rhs_lm

        # gauge fixing (identical replicated computation on every device)
        free = (~p.pose_fixed).astype(S.dtype)
        fmask = free[:, None, None, None] * free[None, :, None, None]
        S = S * fmask
        S = S.at[jnp.arange(M), jnp.arange(M)].add(
            (1.0 - free)[:, None, None] * eye6)
        rhs = rhs * free[:, None]
        Sd = S.transpose(0, 2, 1, 3).reshape(6 * M, 6 * M)
        dxi = jnp.linalg.solve(Sd, rhs.reshape(-1)).reshape(M, 6)
        dxi = dxi * free[:, None]

        # landmark back-substitution: local, no communication
        Wt_dxi = jnp.einsum("mpik,mi->pk", W, dxi)
        dX = jnp.sum(Hl_inv * (b_l - Wt_dxi)[:, None, :], -1)

        T_new = se3_exp(dxi) @ T_cw
        X_new = lm_xyz + dX
        cost_new = _total_cost(p, T_new, X_new, huber_delta, axis)
        accept = cost_new < cost
        T_out = jnp.where(accept, T_new, T_cw)
        X_out = jnp.where(accept, X_new, lm_xyz)
        lam_out = jnp.where(accept, jnp.maximum(lam / lam_factor, 1e-9),
                            jnp.minimum(lam * lam_factor, 1e6))
        return (T_out, X_out, lam_out, cost_new), cost

    cost0 = _total_cost(p, p.T_cw, p.lm_xyz, huber_delta, axis)
    (T_cw, lm_xyz, _, cost_final), _ = jax.lax.scan(
        lm_iter, (p.T_cw, p.lm_xyz, jnp.float32(lam0), cost0),
        None, length=iterations)
    return BAResult(T_cw=T_cw, lm_xyz=lm_xyz, initial_cost=cost0,
                    final_cost=cost_final, iterations=jnp.int32(iterations))


def landmark_sharded_bundle_adjust(prob: BAProblem, mesh: Mesh,
                                   iterations: int = 10,
                                   huber_delta: float = 2.0,
                                   lam0: float = 1e-3,
                                   lam_factor: float = 10.0,
                                   pre_partitioned: bool = False) -> BAResult:
    """Distributed BA with the landmark axis (and its observations) sharded
    over `mesh`. Communication per LM iteration is O(M^2 * 36) floats —
    independent of P and N.

    Accepts a 1-D mesh (single-host: all shards on ICI) OR a 2-D
    ("dcn", lm) pod mesh from `make_pod_mesh`: landmarks shard over the
    flattened (host, local-device) grid and the camera-system reductions
    psum over both axes, which XLA lowers hierarchically (ICI first, one
    contribution per host over DCN)."""
    axes = mesh.axis_names
    axis = axes[0] if len(axes) == 1 else tuple(axes)
    n_shards = int(np.prod([mesh.shape[a] for a in axes]))
    Pn = prob.lm_xyz.shape[0]
    p_part = prob if pre_partitioned else partition_by_landmark(prob, n_shards)

    specs = BAProblem(
        T_cw=P(), lm_xyz=P(axis),
        obs_uv=P(None, axis, None),
        obs_lm=P(None, axis),
        obs_mask=P(None, axis),
        K=P(), pose_fixed=P(),
        lm_fixed=None if p_part.lm_fixed is None else P(axis))
    out_specs = BAResult(T_cw=P(), lm_xyz=P(axis), initial_cost=P(),
                         final_cost=P(), iterations=P())

    @jax.jit
    @functools.partial(jax.shard_map, mesh=mesh, in_specs=(specs,),
                       out_specs=out_specs)
    def run(p_local: BAProblem) -> BAResult:
        return _lm_loop_landmark_sharded(p_local, iterations, huber_delta,
                                         lam0, lam_factor, axis)

    res = run(p_part)
    return res._replace(lm_xyz=res.lm_xyz[:Pn])
