"""Batched small-matrix linear algebra as compact XLA programs.

XLA's generic eigh/svd lower to large, mostly-sequential HLO on TPU — a poor
fit for the thousands of tiny (3x3 .. 12x12) symmetric eigenproblems the
RANSAC solvers and triangulation generate per frame. This module provides
fixed-sweep cyclic-Jacobi routines that vectorize cleanly over a batch axis:
a few dozen fused VPU ops per sweep regardless of batch size, tiny compile
footprint, deterministic runtime.

Accuracy: 6-10 sweeps drive off-diagonal mass to ~f32 epsilon for n <= 12
(Jacobi is quadratically convergent); tests compare against numpy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _use_jacobi() -> bool:
    """Jacobi on TPU (XLA's generic eigh/svd compile huge and run slow
    there); LAPACK-backed jnp.linalg on CPU (faster, and the CPU test suite
    exercises the same call sites)."""
    return jax.default_backend() != "cpu"


@functools.partial(jax.jit, static_argnames=("sweeps",))
def jacobi_eigh(A: jnp.ndarray, sweeps: int = 8):
    """Symmetric eigendecomposition via cyclic Jacobi rotations.

    Args:
      A: [..., n, n] symmetric matrices (n static, small).

    Returns:
      (w [..., n] eigenvalues ascending, V [..., n, n] with columns as
      eigenvectors — same convention as jnp.linalg.eigh).
    """
    n = A.shape[-1]
    batch_shape = A.shape[:-2]
    M = A.astype(jnp.float32)
    V = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32),
                         batch_shape + (n, n)).copy()

    pairs = [(p, q) for p in range(n - 1) for q in range(p + 1, n)]

    def rotate(MV, pq):
        M, V = MV
        p, q = pq
        app = M[..., p, p]
        aqq = M[..., q, q]
        apq = M[..., p, q]
        # Jacobi rotation angle: theta = 0.5 atan2(2 apq, aqq - app)
        theta = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
        c = jnp.cos(theta)[..., None]
        s = jnp.sin(theta)[..., None]
        # rotate rows/cols p and q of M: M' = J^T M J
        row_p = M[..., p, :]
        row_q = M[..., q, :]
        new_p = c[..., 0:1] * 0 + (c * row_p - s * row_q)
        new_q = s * row_p + c * row_q
        M = M.at[..., p, :].set(new_p).at[..., q, :].set(new_q)
        col_p = M[..., :, p]
        col_q = M[..., :, q]
        new_cp = c * col_p - s * col_q
        new_cq = s * col_p + c * col_q
        M = M.at[..., :, p].set(new_cp).at[..., :, q].set(new_cq)
        # accumulate eigenvectors (columns): V' = V J
        vp = V[..., :, p]
        vq = V[..., :, q]
        V = V.at[..., :, p].set(c * vp - s * vq)
        V = V.at[..., :, q].set(s * vp + c * vq)
        return (M, V)

    def sweep(MV, _):
        for pq in pairs:
            MV = rotate(MV, pq)
        return MV, None

    (M, V), _ = jax.lax.scan(sweep, (M, V), None, length=sweeps)
    w = jnp.diagonal(M, axis1=-2, axis2=-1)
    # sort ascending like jnp.linalg.eigh
    order = jnp.argsort(w, axis=-1)
    w_sorted = jnp.take_along_axis(w, order, axis=-1)
    V_sorted = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w_sorted, V_sorted


def smallest_eigvec(A: jnp.ndarray, sweeps: int = 8) -> jnp.ndarray:
    """Eigenvector of the smallest eigenvalue of symmetric [..., n, n]."""
    if not _use_jacobi():
        _, V = jnp.linalg.eigh(A)
        return V[..., :, 0]
    _, V = jacobi_eigh(A, sweeps=sweeps)
    return V[..., :, 0]


def svd3(A: jnp.ndarray, sweeps: int = 8):
    """SVD of [..., 3, 3] via eigh of A^T A (one-sided Jacobi).

    Returns (U, S, Vt) with S descending, U/V proper for full-rank inputs;
    rank-deficient columns of U are completed by cross products so U stays
    orthogonal (needed for essential-matrix decomposition where s3 = 0).
    """
    AtA = jnp.swapaxes(A, -1, -2) @ A
    if _use_jacobi():
        w, V = jacobi_eigh(AtA, sweeps=sweeps)      # ascending
    else:
        w, V = jnp.linalg.eigh(AtA)                 # ascending
    # descending order
    w = w[..., ::-1]
    V = V[..., :, ::-1]
    S = jnp.sqrt(jnp.clip(w, 0.0, None))
    AV = A @ V
    # u_i = A v_i / s_i where s_i is significant; Jacobi leaves ~1e-4
    # relative residue in f32, so the rank test must be RELATIVE to s_max.
    safe = jnp.where(S > 1e-12, S, 1.0)[..., None, :]
    U = AV / safe
    s_max = jnp.clip(S[..., 0], 1e-12, None)

    def normalize(v):
        return v / jnp.clip(jnp.linalg.norm(v, axis=-1, keepdims=True),
                            1e-12, None)

    u0 = normalize(U[..., :, 0])
    # Gram-Schmidt u1 against u0, cross-product fallback for u2: keeps U
    # orthogonal even when s2/s3 are numerically tiny (essential matrices).
    u1 = U[..., :, 1]
    u1 = normalize(u1 - jnp.sum(u1 * u0, -1, keepdims=True) * u0)
    u2 = U[..., :, 2]
    u2_cross = jnp.cross(u0, u1)
    degenerate = (S[..., 2] < 1e-3 * s_max)[..., None]
    u2 = jnp.where(degenerate, u2_cross, u2)
    u2 = u2 - jnp.sum(u2 * u0, -1, keepdims=True) * u0
    u2 = normalize(u2 - jnp.sum(u2 * u1, -1, keepdims=True) * u1)
    U = jnp.stack([u0, u1, u2], axis=-1)
    return U, S, jnp.swapaxes(V, -1, -2)
