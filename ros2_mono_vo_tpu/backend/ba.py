"""Sliding-window bundle adjustment: Levenberg-Marquardt with Schur
complement, as one jitted tensor program.

This implements the reference's roadmap backend ("Local Bundle Adjustment",
reference README.md:97 — absent from its code) the TPU-native way
(SURVEY.md section 7, stage 7): the camera-landmark bipartite structure is
exploited by eliminating the landmark block (batched 3x3 solves) and solving
the small reduced camera system densely on the MXU. All observation work is
batched over the fixed [M, N] keyframe-slot grid with masks.

Shapes:
  M = window keyframes, N = feature slots per keyframe, P = window landmark
  capacity. H_pp is block-diagonal [M, 6, 6] (observations touch one pose),
  W = pose-landmark coupling [M, P, 6, 3], H_ll block-diagonal [P, 3, 3].
  Reduced system S = H_pp - W H_ll^-1 W^T is [6M, 6M] dense (M <= 32).

The same kernel body is reused by the distributed backend
(parallel/dist_ba.py): observations are sharded over devices and the
reductions (H_pp, H_ll, W, b, cost) become psums over the mesh.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ros2_mono_vo_tpu.geometry.se3 import se3_exp, hat


class BAProblem(NamedTuple):
    """Fixed-shape window problem.

    All index arrays refer to LOCAL window landmark slots [0, P).
    """

    T_cw: jnp.ndarray       # [M, 4, 4] world->camera extrinsics
    lm_xyz: jnp.ndarray     # [P, 3] world landmark positions
    obs_uv: jnp.ndarray     # [M, N, 2] pixel observations
    obs_lm: jnp.ndarray     # [M, N] int32 local landmark index (-1 = none)
    obs_mask: jnp.ndarray   # [M, N] bool
    K: jnp.ndarray          # [3, 3]
    pose_fixed: jnp.ndarray  # [M] bool — gauge-fixed poses (no update)
    # Optional [P] bool — landmarks held constant (no update). Sliding-window
    # BA whose gauge is only the two oldest WINDOW poses lets global scale
    # drift as the window slides (measured as a linear V-shaped ATE residual);
    # freezing the landmarks observed by the gauge keyframes anchors the
    # window to the global map's scale, like the reference's never-updated
    # landmark store does implicitly.
    lm_fixed: jnp.ndarray | None = None


class BAResult(NamedTuple):
    T_cw: jnp.ndarray
    lm_xyz: jnp.ndarray
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    iterations: jnp.ndarray


def _residual_and_jacobians(T_cw, lm_xyz, obs_uv, obs_lm, obs_mask, K):
    """Residuals [M, N, 2] + Jacobians wrt pose xi [M, N, 2, 6] and landmark
    position [M, N, 2, 3]; mask folded in (invalid rows are zero)."""
    P = lm_xyz.shape[0]
    idx = jnp.clip(obs_lm, 0, P - 1)
    X = lm_xyz[idx]                              # [M, N, 3]
    R = T_cw[:, :3, :3]
    t = T_cw[:, :3, 3]
    # All per-observation contractions below (over 2- or 3-wide axes) are
    # broadcast-multiply-reduce, NOT einsum: XLA lowers the einsums to
    # per-observation [2,3]x[3,6]-class batched matmuls, which issue one
    # tiny MXU op per observation (~0.3 ms each at M=8, N=512 — measured
    # as the dominant cost of the whole assembly); the identical math as a
    # VPU elementwise+reduce fusion runs in tens of microseconds.
    pc = jnp.sum(R[:, None, :, :] * X[:, :, None, :], -1) + t[:, None, :]
    z = pc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    fx, fy = K[0, 0], K[1, 1]
    u = fx * pc[..., 0] / zs + K[0, 2]
    v = fy * pc[..., 1] / zs + K[1, 2]
    r = jnp.stack([u - obs_uv[..., 0], v - obs_uv[..., 1]], -1)  # [M, N, 2]
    mask = obs_mask & (obs_lm >= 0) & (z > 1e-3)
    r = jnp.where(mask[..., None], r, 0.0)

    inv_z = 1.0 / zs
    inv_z2 = inv_z * inv_z
    zero = jnp.zeros_like(z)
    du = jnp.stack([fx * inv_z, zero, -fx * pc[..., 0] * inv_z2], -1)
    dv = jnp.stack([zero, fy * inv_z, -fy * pc[..., 1] * inv_z2], -1)
    Juv_pc = jnp.stack([du, dv], -2)             # [M, N, 2, 3]
    # pose: left-mult update T <- exp(xi) T => d(pc)/d(xi) = [I | -hat(pc)]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape[:-1] + (3, 3))
    Jpc_xi = jnp.concatenate([eye, -hat(pc)], -1)  # [M, N, 3, 6]
    Jp = jnp.sum(Juv_pc[..., :, :, None] * Jpc_xi[..., None, :, :],
                 -2)                               # [M, N, 2, 6]
    # landmark: d(pc)/dX = R
    Jl = jnp.sum(Juv_pc[..., :, :, None] * R[:, None, None, :, :],
                 -2)                               # [M, N, 2, 3]
    m = mask[..., None, None]
    return r, jnp.where(m, Jp, 0.0), jnp.where(m, Jl, 0.0), mask


def _huber_weight(r, delta):
    """Sqrt-weights for Huber robust loss on the residual norm."""
    nrm = jnp.linalg.norm(r, axis=-1)
    w = jnp.where(nrm <= delta, 1.0, delta / jnp.clip(nrm, 1e-9, None))
    return jnp.sqrt(w)


def _cost(r, delta):
    nrm2 = jnp.sum(r * r, -1)
    nrm = jnp.sqrt(jnp.clip(nrm2, 1e-18, None))
    quad = 0.5 * nrm2
    lin = delta * (nrm - 0.5 * delta)
    return jnp.sum(jnp.where(nrm <= delta, quad, lin))


def _inv3x3(A):
    """Batched closed-form 3x3 inverse (adjugate/det)."""
    a = A[..., 0, 0]; b = A[..., 0, 1]; c = A[..., 0, 2]
    d = A[..., 1, 0]; e = A[..., 1, 1]; f = A[..., 1, 2]
    g = A[..., 2, 0]; h = A[..., 2, 1]; i = A[..., 2, 2]
    co_a = e * i - f * h
    co_b = c * h - b * i
    co_c = b * f - c * e
    co_d = f * g - d * i
    co_e = a * i - c * g
    co_f = c * d - a * f
    co_g = d * h - e * g
    co_h = b * g - a * h
    co_i = a * e - b * d
    det = a * co_a + b * co_d + c * co_g
    dets = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack([
        jnp.stack([co_a, co_b, co_c], -1),
        jnp.stack([co_d, co_e, co_f], -1),
        jnp.stack([co_g, co_h, co_i], -1)], -2)
    return adj / dets[..., None, None]


def build_normal_equations(prob: BAProblem, huber_delta: float,
                           psum_axis: str | None = None):
    """Assemble (H_pp [M,6,6], W [M,P,6,3], H_ll [P,3,3], b_p [M,6],
    b_l [P,3], cost). With `psum_axis`, all outputs are all-reduced over the
    named mesh axis (observation-sharded distributed assembly)."""
    P = prob.lm_xyz.shape[0]
    r, Jp, Jl, mask = _residual_and_jacobians(
        prob.T_cw, prob.lm_xyz, prob.obs_uv, prob.obs_lm, prob.obs_mask, prob.K)
    sw = _huber_weight(r, huber_delta) * mask
    Jp = Jp * sw[..., None, None]
    Jl = Jl * sw[..., None, None]
    rw = r * sw[..., None]

    H_pp = jnp.einsum("mnik,mnil->mkl", Jp, Jp)
    b_p = -jnp.einsum("mnik,mni->mk", Jp, rw)

    idx = jnp.clip(prob.obs_lm, 0, P - 1)
    slot = jnp.where(mask, idx, P)  # P = all-zero one-hot row (dropped)
    # per-obs outer products as VPU broadcast-reduce (see note in
    # _residual_and_jacobians — einsum here is a tiny-batched-matmul trap)
    Hl_contrib = jnp.sum(Jl[..., :, :, None] * Jl[..., :, None, :], -3)
    bl_contrib = -jnp.sum(Jl * rw[..., None], -2)
    # Landmark-slot accumulation as ONE-HOT MATMULS, not scatter-adds: XLA
    # lowers scatter on TPU to a serialized loop (~ms at this size, and it
    # was the dominant cost of the whole LM iteration), while the identical
    # segment-sum phrased as [P, M*N] x [M*N, k] runs on the MXU in tens of
    # microseconds. bf16 one-hot is exact (0/1); accumulation is f32.
    M = prob.T_cw.shape[0]
    N = slot.shape[1]
    onehot = (slot[..., None] == jnp.arange(P)).astype(jnp.bfloat16)  # [M,N,P]
    lm_flat = jnp.concatenate(
        [Hl_contrib.reshape(M, N, 9), bl_contrib], -1)    # [M, N, 12]
    acc = jnp.einsum("mnp,mnk->pk", onehot, lm_flat,
                     preferred_element_type=jnp.float32)
    H_ll = acc[:, :9].reshape(P, 3, 3)
    b_l = acc[:, 9:]

    W_contrib = jnp.sum(Jp[..., :, :, None] * Jl[..., :, None, :],
                        -3)                            # [M, N, 6, 3]
    W = jnp.einsum("mnp,mnk->mpk", onehot, W_contrib.reshape(M, N, 18),
                   preferred_element_type=jnp.float32).reshape(M, P, 6, 3)

    cost = _cost(jnp.where(mask[..., None], r, 0.0), huber_delta)
    if psum_axis is not None:
        H_pp, W, H_ll, b_p, b_l, cost = jax.lax.psum(
            (H_pp, W, H_ll, b_p, b_l, cost), psum_axis)
    return H_pp, W, H_ll, b_p, b_l, cost


def schur_solve(H_pp, W, H_ll, b_p, b_l, pose_fixed, lam):
    """Eliminate landmarks, solve the reduced camera system, back-substitute.

    Returns (dxi [M, 6], dX [P, 3]).
    """
    M = H_pp.shape[0]
    P = H_ll.shape[0]
    eye3 = jnp.eye(3, dtype=H_ll.dtype)
    eye6 = jnp.eye(6, dtype=H_pp.dtype)
    # LM damping: multiplicative on the diagonal + small absolute floor
    H_ll_d = H_ll + (lam * jnp.abs(H_ll) * eye3 + 1e-8 * eye3)
    H_pp_d = H_pp + (lam * jnp.abs(H_pp) * eye6 + 1e-8 * eye6)
    Hl_inv = _inv3x3(H_ll_d)

    # broadcast-reduce, not einsum: the [6,3]x[3,3] batched-matmul lowering
    # of this line alone measured 0.88 ms at M=8, P=2048 (one tiny MXU op
    # per landmark); the VPU fusion is ~20x cheaper
    WHinv = jnp.sum(W[..., :, :, None] * Hl_inv[:, None, :, :],
                    -2)                                     # [M, P, 6, 3]
    S_off = -jnp.einsum("mpik,qplk->mqil", WHinv, W)        # [M, M, 6, 6]
    S = S_off.at[jnp.arange(M), jnp.arange(M)].add(H_pp_d)
    rhs = b_p - jnp.einsum("mpik,pk->mi", WHinv, b_l)       # [M, 6]

    # gauge fixing: identity rows/cols for fixed poses
    free = (~pose_fixed).astype(S.dtype)
    fmask = free[:, None, None, None] * free[None, :, None, None]
    S = S * fmask
    S = S.at[jnp.arange(M), jnp.arange(M)].add(
        (1.0 - free)[:, None, None] * eye6)
    rhs = rhs * free[:, None]

    Sd = S.transpose(0, 2, 1, 3).reshape(6 * M, 6 * M)
    dxi = jnp.linalg.solve(Sd, rhs.reshape(-1)).reshape(M, 6)
    dxi = dxi * free[:, None]

    # back-substitute landmarks: dX = Hl^-1 (b_l - W^T dxi)
    Wt_dxi = jnp.einsum("mpik,mi->pk", W, dxi)
    dX = jnp.sum(Hl_inv * (b_l - Wt_dxi)[:, None, :], -1)
    return dxi, dX


def _total_cost(prob: BAProblem, T_cw, lm_xyz, huber_delta,
                psum_axis: str | None):
    r, _, _, mask = _residual_and_jacobians(
        T_cw, lm_xyz, prob.obs_uv, prob.obs_lm, prob.obs_mask, prob.K)
    c = _cost(jnp.where(mask[..., None], r, 0.0), huber_delta)
    if psum_axis is not None:
        c = jax.lax.psum(c, psum_axis)
    return c


def lm_loop(prob: BAProblem, iterations: int, huber_delta: float,
            lam0: float, psum_axis: str | None = None,
            lam_factor: float = 10.0) -> BAResult:
    """Levenberg-Marquardt with accept/reject damping control.

    With `psum_axis` set, this is the distributed body: the observation axis
    is sharded across the mesh, normal equations and costs are all-reduced,
    and the (replicated) reduced camera solve + updates are identical on
    every device — the same communication shape as data-parallel training
    (SURVEY.md section 5, distributed backend).
    """

    def lm_iter(carry, _):
        T_cw, lm_xyz, lam, _ = carry
        p = prob._replace(T_cw=T_cw, lm_xyz=lm_xyz)
        H_pp, W, H_ll, b_p, b_l, cost = build_normal_equations(
            p, huber_delta, psum_axis)
        if prob.lm_fixed is not None:
            freeL = (~prob.lm_fixed).astype(W.dtype)
            W = W * freeL[None, :, None, None]
            b_l = b_l * freeL[:, None]
            H_ll = H_ll * freeL[:, None, None]
        dxi, dX = schur_solve(H_pp, W, H_ll, b_p, b_l, prob.pose_fixed, lam)
        T_new = se3_exp(dxi) @ T_cw
        X_new = lm_xyz + dX
        cost_new = _total_cost(prob, T_new, X_new, huber_delta, psum_axis)
        accept = cost_new < cost
        T_out = jnp.where(accept, T_new, T_cw)
        X_out = jnp.where(accept, X_new, lm_xyz)
        lam_out = jnp.where(accept, jnp.maximum(lam / lam_factor, 1e-9),
                            jnp.minimum(lam * lam_factor, 1e6))
        # carry the ACCEPTED cost — a rejected proposal must not surface as
        # the iteration's cost (final_cost would then exceed initial_cost)
        return (T_out, X_out, lam_out, jnp.where(accept, cost_new, cost)), cost

    cost0 = _total_cost(prob, prob.T_cw, prob.lm_xyz, huber_delta, psum_axis)
    (T_cw, lm_xyz, _, cost_final), _ = jax.lax.scan(
        lm_iter, (prob.T_cw, prob.lm_xyz, jnp.float32(lam0), cost0),
        None, length=iterations)
    return BAResult(T_cw=T_cw, lm_xyz=lm_xyz, initial_cost=cost0,
                    final_cost=cost_final, iterations=jnp.int32(iterations))


@functools.partial(jax.jit, static_argnames=("iterations", "lam_factor"))
def bundle_adjust(prob: BAProblem, iterations: int = 10,
                  huber_delta: float = 2.0, lam0: float = 1e-3,
                  lam_factor: float = 10.0) -> BAResult:
    """Single-device sliding-window BA (BackendConfig.lm_* map 1:1 here)."""
    return lm_loop(prob, iterations, huber_delta, lam0, psum_axis=None,
                   lam_factor=lam_factor)
