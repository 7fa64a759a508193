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
import numpy as np


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


def eigh3x3(A: jnp.ndarray):
    """Closed-form symmetric 3x3 eigendecomposition (trigonometric method).

    No loops, no gathers — ~40 fused VPU ops regardless of batch size, vs
    ~190 for looped Jacobi: this is what makes per-hypothesis svd3 cheap in
    the RANSAC solvers. Eigenvectors via the cross-of-rows method with an
    isotropic-subspace fallback (repeated eigenvalues — e.g. essential
    matrices with singular values (1, 1, 0) — admit any orthonormal basis of
    the eigenplane, which the fallback provides).

    Returns (w [..., 3] ascending, V [..., 3, 3] columns) like jnp.linalg.eigh.
    """
    A = A.astype(jnp.float32)
    a11, a12, a13 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a22, a23, a33 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    p1 = a12 * a12 + a13 * a13 + a23 * a23
    q = (a11 + a22 + a33) / 3.0
    p2 = ((a11 - q) ** 2 + (a22 - q) ** 2 + (a33 - q) ** 2) + 2.0 * p1
    p = jnp.sqrt(jnp.clip(p2 / 6.0, 1e-30, None))
    eye = jnp.eye(3, dtype=A.dtype)
    B = (A - q[..., None, None] * eye) / p[..., None, None]
    detB = jnp.linalg.det(B)
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    w2 = q + 2.0 * p * jnp.cos(phi)                      # largest
    w0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    w1 = 3.0 * q - w2 - w0
    # near-diagonal input: fall back to the diagonal (p ~ 0 makes B garbage)
    diagish = p2 < 1e-24
    d = jnp.stack([a11, a22, a33], -1)
    d_sorted = jnp.sort(d, axis=-1)
    w = jnp.where(diagish[..., None], d_sorted, jnp.stack([w0, w1, w2], -1))

    def cross_rows(lam):
        M = A - lam[..., None, None] * eye
        r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
        c01 = jnp.cross(r0, r1)
        c02 = jnp.cross(r0, r2)
        c12 = jnp.cross(r1, r2)
        n01 = jnp.sum(c01 * c01, -1)
        n02 = jnp.sum(c02 * c02, -1)
        n12 = jnp.sum(c12 * c12, -1)
        best01 = (n01 >= n02) & (n01 >= n12)
        best02 = (~best01) & (n02 >= n12)
        c = jnp.where(best01[..., None], c01,
                      jnp.where(best02[..., None], c02, c12))
        n = jnp.sqrt(jnp.sum(c * c, -1, keepdims=True))
        ok = n[..., 0] > 1e-20
        c = jnp.where(ok[..., None], c / jnp.where(ok[..., None], n, 1.0),
                      jnp.zeros_like(c).at[..., 0].set(1.0))
        return c, ok

    def any_perp(v):
        # unit vector perpendicular to v: cross with the axis least parallel
        ex = jnp.zeros_like(v).at[..., 0].set(1.0)
        ey = jnp.zeros_like(v).at[..., 1].set(1.0)
        use_y = jnp.abs(v[..., 0]) > 0.9
        c = jnp.cross(v, jnp.where(use_y[..., None], ey, ex))
        return c / jnp.clip(jnp.linalg.norm(c, axis=-1, keepdims=True),
                            1e-20, None)

    # compute the better-separated extreme eigenvector first
    sep0 = w[..., 1] - w[..., 0]
    sep2 = w[..., 2] - w[..., 1]
    first_is_low = sep0 >= sep2
    lam_first = jnp.where(first_is_low, w[..., 0], w[..., 2])
    v_first, _ = cross_rows(lam_first)
    # middle eigenvector: cross-rows, orthogonalized; isotropic fallback
    v_mid_raw, _ = cross_rows(w[..., 1])
    v_mid = v_mid_raw - jnp.sum(v_mid_raw * v_first, -1, keepdims=True) * v_first
    nm = jnp.linalg.norm(v_mid, axis=-1, keepdims=True)
    v_mid = jnp.where(nm > 1e-6, v_mid / jnp.clip(nm, 1e-20, None),
                      any_perp(v_first))
    v_last = jnp.cross(v_first, v_mid)
    v0 = jnp.where(first_is_low[..., None], v_first, v_last)
    v2 = jnp.where(first_is_low[..., None], v_last, v_first)
    V = jnp.stack([v0, v_mid, v2], axis=-1)
    return w, V


def solve_elim(G: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dense solve G x = b via Gaussian elimination with partial
    pivoting, fully unrolled over the (small, static) dimension.

    ~12 fused VPU ops per pivot step regardless of batch size — the batched
    small-solve primitive underneath inverse iteration. Row swaps are
    expressed as rank-1 updates (no gathers/scatters).

    G: [..., d, d], b: [..., d] -> x [..., d].
    """
    d = G.shape[-1]
    M = jnp.concatenate([G, b[..., None]], -1)          # [..., d, d+1]
    arange_d = jnp.arange(d)
    for k in range(d):
        col = jnp.abs(M[..., :, k])
        col = jnp.where(arange_d >= k, col, -1.0)
        piv = jnp.argmax(col, -1)                        # [...]
        e_piv = (arange_d == piv[..., None]).astype(M.dtype)   # [..., d]
        e_k = (arange_d == k).astype(M.dtype)                  # [d]
        row_piv = jnp.einsum("...r,...rc->...c", e_piv, M)     # [..., d+1]
        row_k = M[..., k, :]
        diff = row_piv - row_k
        M = (M + e_k[..., :, None] * diff[..., None, :]
             - e_piv[..., :, None] * diff[..., None, :])
        pv = M[..., k, k]
        pv = jnp.where(jnp.abs(pv) < 1e-20,
                       jnp.where(pv < 0, -1e-20, 1e-20), pv)
        f = jnp.where(arange_d > k, M[..., :, k] / pv[..., None], 0.0)
        M = M - f[..., :, None] * M[..., k:k + 1, :]
    # back-substitution (M is upper triangular)
    x = jnp.zeros_like(b)
    for k in range(d - 1, -1, -1):
        e_k = (arange_d == k).astype(M.dtype)
        s = M[..., k, d] - jnp.einsum("...j,...j->...", M[..., k, :d], x)
        pv = M[..., k, k]
        pv = jnp.where(jnp.abs(pv) < 1e-20,
                       jnp.where(pv < 0, -1e-20, 1e-20), pv)
        x = x + e_k * (s / pv)[..., None]
    return x


# fixed pseudo-random start for inverse iteration: never (anti)parallel nor
# orthogonal to a structured null space by accident
_II_SEED = np.array(
    [0.7713, -0.4526, 0.6097, -0.1253, 0.9817, 0.3471, -0.8254, 0.5622,
     -0.2931, 0.6823, -0.7412, 0.4187, 0.1579, -0.9341, 0.5018, 0.2764],
    np.float32)


def smallest_eigvec(A: jnp.ndarray, iters: int = 2) -> jnp.ndarray:
    """Eigenvector of the smallest eigenvalue of symmetric PSD [..., n, n]
    via regularized inverse iteration.

    Each solve amplifies the small-eigenvalue component by ~lam2 / eps
    (eps = 1e-7 * trace), so 2 iterations reach f32 accuracy whenever a
    spectral gap exists — exactly the RANSAC null-space regime (minimal sets
    have lam1 ~ 0). ~25x fewer HLO ops than looped Jacobi, identical code on
    every backend.
    """
    n = A.shape[-1]
    tr = jnp.trace(A, axis1=-2, axis2=-1)
    scale = jnp.clip(jnp.abs(tr), 1e-20, None)
    G = A + (1e-7 * scale)[..., None, None] * jnp.eye(n, dtype=A.dtype)
    x = jnp.broadcast_to(jnp.asarray(_II_SEED[:n]), A.shape[:-1])
    for _ in range(iters):
        x = solve_elim(G, x)
        x = x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True),
                         1e-30, None)
    return x


def svd3(A: jnp.ndarray, sweeps: int = 8):
    """SVD of [..., 3, 3] via closed-form eigh of A^T A.

    Returns (U, S, Vt) with S descending, U/V proper for full-rank inputs;
    rank-deficient columns of U are completed by cross products so U stays
    orthogonal (needed for essential-matrix decomposition where s3 = 0).
    Same code on every backend (eigh3x3 is loop-free), so the CPU test suite
    exercises exactly the TPU production path.
    """
    AtA = jnp.swapaxes(A, -1, -2) @ A
    w, V = eigh3x3(AtA)                             # ascending
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
