"""Pose-graph optimization over keyframe poses.

The reference's roadmap lists "Pose Graph Optimization" and "Loop Closing"
as future work (reference README.md:97); this implements them TPU-native
(BASELINE.json config #5): fixed-capacity edge arrays with masks, per-edge
Jacobians by forward-mode autodiff at the identity tangent, Gauss-Newton
normal equations assembled as one A^T A matmul over a dense one-hot-placed
Jacobian (scatter-free), dense solve (6K x 6K with K <= ring capacity is
tiny for the MXU).

Edge residual: r(i, j) = log( T_ij_meas^-1 * T_i^-1 * T_j )  in se(3),
with left-multiplicative updates T_k <- T_k * exp(xi_k) (right-tangent).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ros2_mono_vo_tpu.geometry.se3 import se3_exp, se3_log, se3_inverse


class PoseGraph(NamedTuple):
    T_w: jnp.ndarray        # [K, 4, 4] poses (world <- node)
    edge_i: jnp.ndarray     # [E] int32 source node
    edge_j: jnp.ndarray     # [E] int32 target node
    T_ij: jnp.ndarray       # [E, 4, 4] measured relative pose (i <- j)
    edge_weight: jnp.ndarray  # [E] float — 0 disables an edge
    fixed: jnp.ndarray      # [K] bool — gauge anchors


def _edge_residual(T_i, T_j, T_ij):
    return se3_log(se3_inverse(T_ij) @ (se3_inverse(T_i) @ T_j))


def _edge_residual_jacobians(T_i, T_j, T_ij):
    """Residual [6] + Jacobians wrt right-tangent updates of i and j [6, 6]."""

    def f(xi, xj):
        return _edge_residual(T_i @ se3_exp(xi), T_j @ se3_exp(xj), T_ij)

    zero = jnp.zeros(6, T_i.dtype)
    r = f(zero, zero)
    Ji = jax.jacfwd(f, argnums=0)(zero, zero)
    Jj = jax.jacfwd(f, argnums=1)(zero, zero)
    return r, Ji, Jj


def graph_cost(g: PoseGraph) -> jnp.ndarray:
    """Weighted sum of squared se(3) edge residuals at the current poses."""
    r = jax.vmap(_edge_residual)(g.T_w[g.edge_i], g.T_w[g.edge_j], g.T_ij)
    return jnp.sum(jnp.sum(r * r, -1) * g.edge_weight)


@functools.partial(jax.jit, static_argnames=("iterations",))
def optimize_pose_graph(g: PoseGraph, iterations: int = 20,
                        lam0: float = 1e-4):
    """Damped Gauss-Newton over all node poses. Returns (T_w, final_cost)."""
    K = g.T_w.shape[0]

    def cost_of(T_w):
        r = jax.vmap(_edge_residual)(T_w[g.edge_i], T_w[g.edge_j], g.T_ij)
        return jnp.sum(jnp.sum(r * r, -1) * g.edge_weight)

    def gn_iter(carry, _):
        T_w, lam, _ = carry
        r, Ji, Jj = jax.vmap(_edge_residual_jacobians)(
            T_w[g.edge_i], T_w[g.edge_j], g.T_ij)
        E = r.shape[0]
        # Assemble via a DENSE one-hot-placed Jacobian A [E*6, K*6] and one
        # H = A^T A matmul — NOT per-edge scatter-adds of 4 [6,6] blocks:
        # scatter lowers to a serialized sort pipeline on TPU and the
        # per-edge JiT@Ji products are tiny-batched-matmul traps (see
        # backend/ba.py); this runs in-scan at keyframe cadence when loop
        # closure is on, pgo_iterations deep.
        sqw = jnp.sqrt(g.edge_weight)
        Oi = (g.edge_i[:, None] == jnp.arange(K)).astype(T_w.dtype)  # [E, K]
        Oj = (g.edge_j[:, None] == jnp.arange(K)).astype(T_w.dtype)
        A = (Oi[:, None, :, None] * Ji[:, :, None, :]
             + Oj[:, None, :, None] * Jj[:, :, None, :])   # [E, 6, K, 6]
        Af = (A * sqw[:, None, None, None]).reshape(E * 6, K * 6)
        rw = (r * sqw[:, None]).reshape(E * 6)
        Hd = Af.T @ Af                                     # [K*6, K*6]
        b = -(rw @ Af)                                     # [K*6]

        free = (~g.fixed).astype(T_w.dtype)
        fm = jnp.repeat(free, 6)
        Hd = Hd * fm[:, None] * fm[None, :]
        Hd = Hd + jnp.diag(1.0 - fm) + lam * jnp.diag(jnp.diag(Hd)) \
            + 1e-9 * jnp.eye(K * 6, dtype=T_w.dtype)
        bv = b * fm
        dx = jnp.linalg.solve(Hd, bv).reshape(K, 6) * free[:, None]

        T_new = T_w @ se3_exp(dx)
        c_old = cost_of(T_w)
        c_new = cost_of(T_new)
        accept = c_new < c_old
        T_out = jnp.where(accept, T_new, T_w)
        lam_out = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9),
                            jnp.minimum(lam * 4.0, 1e4))
        return (T_out, lam_out, jnp.where(accept, c_new, c_old)), None

    c0 = cost_of(g.T_w)
    (T_w, _, c_final), _ = jax.lax.scan(
        gn_iter, (g.T_w, jnp.float32(lam0), c0), None, length=iterations)
    return T_w, c_final


def odometry_edges(T_w: jnp.ndarray, valid: jnp.ndarray):
    """Consecutive-node edges from current pose estimates (the odometry
    backbone of the graph). Returns (edge_i, edge_j, T_ij, weight)."""
    K = T_w.shape[0]
    i = jnp.arange(K - 1, dtype=jnp.int32)
    j = i + 1
    T_ij = se3_inverse(T_w[i]) @ T_w[j]
    w = (valid[i] & valid[j]).astype(jnp.float32)
    return i, j, T_ij, w
