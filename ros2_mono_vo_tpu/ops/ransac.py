"""Hypothesis-parallel robust estimation: one RANSAC engine, four solvers.

TPU-native replacement for the reference's four sequential OpenCV RANSAC call
sites (SURVEY.md section 2 kernel table):
  - cv::findHomography      (initializer.cpp:82, tracker.cpp:243)
  - cv::findFundamentalMat  (initializer.cpp:87, tracker.cpp:248)
  - cv::findEssentialMat    (initializer.cpp:228-229)
  - cv::solvePnPRansac      (tracker.cpp:309)
plus cv::recoverPose (initializer.cpp:236).

Instead of a sequential hypothesize-and-verify loop, B minimal sets are drawn
at once (Gumbel top-k over the validity mask), all B models are solved as one
batched eigendecomposition, and all B x N residuals are scored as one tensor
op. The best hypothesis is then refined on its inliers with a masked
least-squares (linear models) or Gauss-Newton (PnP) polish.

All functions are pure and jittable with static hypothesis counts.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ros2_mono_vo_tpu.geometry.se3 import so3_exp, hat, make_se3
from ros2_mono_vo_tpu.ops.linalg import smallest_eigvec, svd3
from ros2_mono_vo_tpu.geometry.projection import project_points, pixel_to_normalized

_BIG = jnp.float32(1e12)


class RansacResult(NamedTuple):
    model: jnp.ndarray    # model parameters (shape depends on estimator)
    inliers: jnp.ndarray  # [N] bool
    count: jnp.ndarray    # scalar int32 inlier count


# ---------------------------------------------------------------------------
# Minimal-set sampling
# ---------------------------------------------------------------------------

def sample_minimal_sets(key: jax.Array, valid: jnp.ndarray,
                        num_hypotheses: int, sample_size: int) -> jnp.ndarray:
    """Draw [B, k] index sets of distinct valid entries (Gumbel top-k).

    Invalid entries get -inf perturbed scores, so they are only picked when
    fewer than k valid entries exist (callers gate on that separately).
    """
    n = valid.shape[0]
    g = jax.random.gumbel(key, (num_hypotheses, n))
    scores = jnp.where(valid[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(scores, sample_size)
    return idx


# ---------------------------------------------------------------------------
# Conditioning
# ---------------------------------------------------------------------------

def _hartley_normalize(pts: jnp.ndarray, valid: jnp.ndarray | None = None):
    """Similarity transform T s.t. T*pts has zero centroid, mean norm sqrt(2).

    pts [..., N, 2] -> (pts_n [..., N, 2], T [..., 3, 3]).
    """
    if valid is None:
        w = jnp.ones(pts.shape[:-1], pts.dtype)
    else:
        w = valid.astype(pts.dtype)
    wsum = jnp.clip(jnp.sum(w, -1, keepdims=True), 1.0, None)
    centroid = jnp.sum(pts * w[..., None], -2, keepdims=True) / wsum[..., None]
    d = jnp.linalg.norm(pts - centroid, axis=-1)
    mean_d = jnp.sum(d * w, -1, keepdims=True) / wsum
    s = jnp.sqrt(2.0) / jnp.clip(mean_d, 1e-8, None)
    pts_n = (pts - centroid) * s[..., None]
    cx = centroid[..., 0, 0]
    cy = centroid[..., 0, 1]
    sq = s[..., 0]
    zero = jnp.zeros_like(sq)
    one = jnp.ones_like(sq)
    T = jnp.stack([
        jnp.stack([sq, zero, -sq * cx], -1),
        jnp.stack([zero, sq, -sq * cy], -1),
        jnp.stack([zero, zero, one], -1)], -2)
    return pts_n, T


def _null_vector(A: jnp.ndarray) -> jnp.ndarray:
    """Right-singular vector of the smallest singular value via eigh(A^T A).

    A: [..., M, D] -> [..., D].
    """
    AtA = jnp.swapaxes(A, -1, -2) @ A
    return smallest_eigvec(AtA)


# ---------------------------------------------------------------------------
# Minimal solvers (batched over a leading hypothesis axis via vmap)
# ---------------------------------------------------------------------------

def solve_homography_dlt(uv1: jnp.ndarray, uv2: jnp.ndarray,
                         w: jnp.ndarray | None = None) -> jnp.ndarray:
    """DLT homography from >= 4 correspondences. uv* [N, 2] -> H [3, 3]."""
    valid = None if w is None else w > 0
    p1, T1 = _hartley_normalize(uv1, valid)
    p2, T2 = _hartley_normalize(uv2, valid)
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    zero = jnp.zeros_like(x1)
    one = jnp.ones_like(x1)
    rows_x = jnp.stack([-x1, -y1, -one, zero, zero, zero,
                        x2 * x1, x2 * y1, x2], -1)
    rows_y = jnp.stack([zero, zero, zero, -x1, -y1, -one,
                        y2 * x1, y2 * y1, y2], -1)
    A = jnp.concatenate([rows_x, rows_y], -2)
    if w is not None:
        ww = jnp.concatenate([w, w], -1)
        A = A * ww[..., None]
    h = _null_vector(A)
    Hn = h.reshape(h.shape[:-1] + (3, 3))
    # T2 is the similarity [s,0,-s*cx; 0,s,-s*cy; 0,0,1] — invert
    # analytically: jnp.linalg.inv here is a batched LU custom call that
    # alone cost 1.3 ms at 512 hypotheses (measured)
    sq = T2[..., 0, 0]
    zero = jnp.zeros_like(sq)
    one = jnp.ones_like(sq)
    inv_s = 1.0 / sq
    T2_inv = jnp.stack([
        jnp.stack([inv_s, zero, -T2[..., 0, 2] * inv_s], -1),
        jnp.stack([zero, inv_s, -T2[..., 1, 2] * inv_s], -1),
        jnp.stack([zero, zero, one], -1)], -2)
    H = T2_inv @ Hn @ T1
    return H / jnp.where(jnp.abs(H[..., 2:3, 2:3]) < 1e-12, 1e-12, H[..., 2:3, 2:3])


def solve_fundamental_8pt(uv1: jnp.ndarray, uv2: jnp.ndarray,
                          w: jnp.ndarray | None = None) -> jnp.ndarray:
    """Normalized 8-point fundamental matrix with rank-2 projection."""
    valid = None if w is None else w > 0
    p1, T1 = _hartley_normalize(uv1, valid)
    p2, T2 = _hartley_normalize(uv2, valid)
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    one = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, one], -1)
    if w is not None:
        A = A * w[..., None]
    f = _null_vector(A)
    Fn = f.reshape(f.shape[:-1] + (3, 3))
    # rank-2 projection
    U, S, Vt = svd3(Fn)
    S = S.at[..., 2].set(0.0)
    Fn = (U * S[..., None, :]) @ Vt
    F = jnp.swapaxes(T2, -1, -2) @ Fn @ T1
    norm = jnp.linalg.norm(F.reshape(F.shape[:-2] + (9,)), axis=-1)[..., None, None]
    return F / jnp.clip(norm, 1e-12, None)


def solve_essential_8pt(xy1: jnp.ndarray, xy2: jnp.ndarray,
                        w: jnp.ndarray | None = None) -> jnp.ndarray:
    """8-point essential matrix on normalized image coords, projected onto
    the essential manifold (singular values (1, 1, 0))."""
    F = solve_fundamental_8pt(xy1, xy2, w)
    U, _, Vt = svd3(F)
    S = jnp.ones_like(F[..., 0]) * jnp.asarray([1.0, 1.0, 0.0], F.dtype)
    return (U * S[..., None, :]) @ Vt


def solve_pnp_dlt(X: jnp.ndarray, uv: jnp.ndarray, K: jnp.ndarray,
                  w: jnp.ndarray | None = None):
    """DLT pose from >= 6 3D-2D correspondences.

    X [N, 3] world points, uv [N, 2] pixels -> (R [3, 3], t [3]) world->cam.
    Solves for P' = [R|t] T_norm^-1 on similarity-normalized 3D points
    (zero centroid, unit RMS radius) then re-orthonormalizes via SVD.
    The normalization is essential in f32: raw world coordinates give
    cond(A^T A) ~ 1e8+ and eigh-based null vectors turn to noise.
    """
    xy = pixel_to_normalized(K, uv)  # removes K: solve M = [R|t] directly
    x, y = xy[..., 0], xy[..., 1]
    if w is None:
        wn = jnp.ones(X.shape[:-1], X.dtype)
    else:
        wn = w
    wsum = jnp.clip(jnp.sum(wn, -1, keepdims=True), 1.0, None)
    centroid = jnp.sum(X * wn[..., None], -2, keepdims=True) / wsum[..., None]
    Xc = X - centroid
    rms = jnp.sqrt(jnp.sum(jnp.sum(Xc * Xc, -1) * wn, -1, keepdims=True)
                   / wsum)
    s = 1.0 / jnp.clip(rms, 1e-8, None)          # [..., 1]
    Xn = Xc * s[..., None]
    Xh = jnp.concatenate([Xn, jnp.ones_like(Xn[..., :1])], -1)  # [N, 4]
    zero = jnp.zeros_like(Xh)
    rows_x = jnp.concatenate([Xh, zero, -x[..., None] * Xh], -1)  # [N, 12]
    rows_y = jnp.concatenate([zero, Xh, -y[..., None] * Xh], -1)
    A = jnp.concatenate([rows_x, rows_y], -2)  # [2N, 12]
    if w is not None:
        ww = jnp.concatenate([w, w], -1)
        A = A * ww[..., None]
    p = _null_vector(A)
    P = p.reshape(p.shape[:-1] + (3, 4))
    M = P[..., :3]
    # scale: make det(M) > 0 and singular values ~ 1
    detM = jnp.linalg.det(M)
    sign = jnp.where(detM < 0, -1.0, 1.0)
    P = P * sign[..., None, None]
    M = P[..., :3]
    U, S, Vt = svd3(M)
    scale = jnp.clip(jnp.mean(S, -1), 1e-12, None)
    R = U @ Vt
    # guard reflections from SVD
    detR = jnp.linalg.det(R)
    fix = jnp.ones_like(S).at[..., 2].set(jnp.sign(detR))
    R = (U * fix[..., None, :]) @ Vt
    # undo normalization: x ~ M s(X - c) + p3 = (s M) X + (p3 - s M c); with
    # M = scale * R this is x ~ R X + t, t = p3/(s*scale) - R c
    t = (P[..., 3] / (scale[..., None] * s)
         - jnp.einsum("...ij,...j->...i", R, centroid[..., 0, :]))
    return R, t


# ---------------------------------------------------------------------------
# Residuals
# ---------------------------------------------------------------------------

def homography_reproj_error(H: jnp.ndarray, uv1: jnp.ndarray, uv2: jnp.ndarray):
    """Forward transfer error |H p1 - p2| (OpenCV findHomography's metric).

    H [..., 3, 3], uv* [N, 2] -> [..., N].
    """
    p1 = jnp.concatenate([uv1, jnp.ones_like(uv1[..., :1])], -1)  # [N, 3]
    # broadcast-reduce, not einsum: per-hypothesis [3,3]x[3,N] batched
    # matmuls issue one tiny MXU op per hypothesis (tiny-einsum trap)
    q = jnp.sum(H[..., None, :, :] * p1[:, None, :], -1)
    z = q[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    proj = q[..., :2] / zs[..., None]
    return jnp.linalg.norm(proj - uv2, axis=-1)


def sampson_error(F: jnp.ndarray, uv1: jnp.ndarray, uv2: jnp.ndarray):
    """First-order geometric (Sampson) distance for x2^T F x1 = 0.

    F [..., 3, 3], uv* [N, 2] -> [..., N] (units: pixels for F on pixels,
    normalized coords for E)."""
    p1 = jnp.concatenate([uv1, jnp.ones_like(uv1[..., :1])], -1)
    p2 = jnp.concatenate([uv2, jnp.ones_like(uv2[..., :1])], -1)
    # broadcast-reduce, not einsum (tiny-einsum trap, see above)
    Fp1 = jnp.sum(F[..., None, :, :] * p1[:, None, :], -1)
    Ftp2 = jnp.sum(jnp.swapaxes(F, -1, -2)[..., None, :, :]
                   * p2[:, None, :], -1)
    num = jnp.sum(p2 * Fp1, -1)
    den = (Fp1[..., 0] ** 2 + Fp1[..., 1] ** 2
           + Ftp2[..., 0] ** 2 + Ftp2[..., 1] ** 2)
    return jnp.abs(num) / jnp.sqrt(jnp.clip(den, 1e-12, None))


# ---------------------------------------------------------------------------
# RANSAC drivers
# ---------------------------------------------------------------------------

def _select_best(err: jnp.ndarray, valid: jnp.ndarray, thresh: float):
    """err [B, N] -> (best_idx, inliers [N], count) by inlier count."""
    inl = (err < thresh) & valid[None, :]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    return best, inl[best], counts[best]


def _msac_score(err: jnp.ndarray, valid: jnp.ndarray, thresh) -> jnp.ndarray:
    """Truncated-quadratic model score sum(min(err^2, thresh^2)) over valid
    points — lower is better. Used to pick raw-vs-refined: a strict
    inlier-count comparison rejects an accurate refined model whenever it
    sheds a single borderline outlier the loose gate had admitted."""
    e2 = jnp.minimum(err * err, thresh * thresh)
    return jnp.sum(jnp.where(valid, e2, 0.0), axis=-1)


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def find_homography_ransac(uv1, uv2, valid, thresh, key,
                           num_hypotheses: int = 512) -> RansacResult:
    """cv::findHomography(RANSAC) equivalent; model refined on inliers."""
    idx = sample_minimal_sets(key, valid, num_hypotheses, 4)
    H = jax.vmap(lambda i: solve_homography_dlt(uv1[i], uv2[i]))(idx)
    err = homography_reproj_error(H, uv1, uv2)
    best, inliers, count = _select_best(err, valid, thresh)
    H_ref = solve_homography_dlt(uv1, uv2, inliers.astype(uv1.dtype))
    err_ref = homography_reproj_error(H_ref, uv1, uv2)
    inl_ref = (err_ref < thresh) & valid
    better = jnp.sum(inl_ref) >= count
    H_out = jnp.where(better, H_ref, H[best])
    inl_out = jnp.where(better, inl_ref, inliers)
    return RansacResult(H_out, inl_out, jnp.sum(inl_out))


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def find_fundamental_ransac(uv1, uv2, valid, thresh, key,
                            num_hypotheses: int = 512) -> RansacResult:
    """cv::findFundamentalMat(FM_RANSAC) equivalent (Sampson scoring)."""
    idx = sample_minimal_sets(key, valid, num_hypotheses, 8)
    F = jax.vmap(lambda i: solve_fundamental_8pt(uv1[i], uv2[i]))(idx)
    err = sampson_error(F, uv1, uv2)
    best, inliers, count = _select_best(err, valid, thresh)
    F_ref = solve_fundamental_8pt(uv1, uv2, inliers.astype(uv1.dtype))
    err_ref = sampson_error(F_ref, uv1, uv2)
    inl_ref = (err_ref < thresh) & valid
    better = jnp.sum(inl_ref) >= count
    F_out = jnp.where(better, F_ref, F[best])
    inl_out = jnp.where(better, inl_ref, inliers)
    return RansacResult(F_out, inl_out, jnp.sum(inl_out))


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def find_essential_ransac(K, uv1, uv2, valid, thresh_px, key,
                          num_hypotheses: int = 512) -> RansacResult:
    """cv::findEssentialMat(RANSAC) equivalent.

    Pixel threshold is converted to normalized coords by the focal length
    (OpenCV does the same internally). Returns E with Sampson inliers.
    """
    xy1 = pixel_to_normalized(K, uv1)
    xy2 = pixel_to_normalized(K, uv2)
    f = 0.5 * (K[0, 0] + K[1, 1])
    thresh = thresh_px / f
    idx = sample_minimal_sets(key, valid, num_hypotheses, 8)
    E = jax.vmap(lambda i: solve_essential_8pt(xy1[i], xy2[i]))(idx)
    err = sampson_error(E, xy1, xy2)
    best, inliers, count = _select_best(err, valid, thresh)
    E_ref = solve_essential_8pt(xy1, xy2, inliers.astype(xy1.dtype))
    err_ref = sampson_error(E_ref, xy1, xy2)
    inl_ref = (err_ref < thresh) & valid
    better = jnp.sum(inl_ref) >= count
    E_out = jnp.where(better, E_ref, E[best])
    inl_out = jnp.where(better, inl_ref, inliers)
    return RansacResult(E_out, inl_out, jnp.sum(inl_out))


# ---------------------------------------------------------------------------
# Essential-matrix pose recovery (cv::recoverPose)
# ---------------------------------------------------------------------------

def _triangulate_normalized(R, t, xy1, xy2):
    """Fast midpoint-style triangulation in normalized coords for chirality
    voting. Returns depths (z1, z2) for each correspondence.

    Solves z2 * x2 = R (z1 * x1) + t per point (least squares on 2 unknowns).
    """
    f1 = jnp.concatenate([xy1, jnp.ones_like(xy1[..., :1])], -1)  # [N, 3]
    f2 = jnp.concatenate([xy2, jnp.ones_like(xy2[..., :1])], -1)
    Rf1 = f1 @ jnp.swapaxes(R, -1, -2)  # [..., N, 3]
    # [Rf1, -f2] [z1, z2]^T = -t
    a11 = jnp.sum(Rf1 * Rf1, -1)
    a12 = -jnp.sum(Rf1 * f2, -1)
    a22 = jnp.sum(f2 * f2, -1)
    b1 = -jnp.sum(Rf1 * t[..., None, :], -1)
    b2 = jnp.sum(f2 * t[..., None, :], -1)
    det = a11 * a22 - a12 * a12
    dets = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    z1 = (a22 * b1 - a12 * b2) / dets
    z2 = (-a12 * b1 + a11 * b2) / dets
    return z1, z2


def recover_pose(E: jnp.ndarray, xy1: jnp.ndarray, xy2: jnp.ndarray,
                 valid: jnp.ndarray):
    """Disambiguate E into (R, t) by chirality voting over all 4 candidates
    (cv::recoverPose, reference initializer.cpp:236). ||t|| = 1 — this is
    where the arbitrary monocular scale is fixed (SURVEY.md quirks).

    Returns (R_cw, t_cw, front_mask [N], votes).
    """
    U, _, Vt = svd3(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    Ra = U @ W @ Vt
    Rb = U @ W.T @ Vt
    tu = U[..., :, 2]
    Rs = jnp.stack([Ra, Ra, Rb, Rb])          # [4, 3, 3]
    ts = jnp.stack([tu, -tu, tu, -tu])        # [4, 3]
    z1, z2 = jax.vmap(_triangulate_normalized, in_axes=(0, 0, None, None))(
        Rs, ts, xy1, xy2)
    front = (z1 > 0) & (z2 > 0) & valid[None, :]
    votes = jnp.sum(front, axis=-1)
    best = jnp.argmax(votes)
    return Rs[best], ts[best], front[best], votes[best]


# ---------------------------------------------------------------------------
# PnP RANSAC + Gauss-Newton polish (cv::solvePnPRansac)
# ---------------------------------------------------------------------------

def _pnp_residual_jacobian(R, t, X, uv, K):
    """Reprojection residual [N, 2] and Jacobian [N, 2, 6] wrt (v, w) of a
    left-multiplied se3 update: T <- exp(xi) T."""
    pc = X @ R.T + t
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    fx, fy = K[0, 0], K[1, 1]
    u = fx * x / zs + K[0, 2]
    v = fy * y / zs + K[1, 2]
    r = jnp.stack([u - uv[..., 0], v - uv[..., 1]], -1)
    inv_z = 1.0 / zs
    inv_z2 = inv_z * inv_z
    # d(u,v)/d(pc)
    du = jnp.stack([fx * inv_z, jnp.zeros_like(z), -fx * x * inv_z2], -1)
    dv = jnp.stack([jnp.zeros_like(z), fy * inv_z, -fy * y * inv_z2], -1)
    Juv_pc = jnp.stack([du, dv], -2)          # [N, 2, 3]
    # d(pc)/d(xi): [I | -hat(pc)]
    Jpc = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), pc.shape[:-1] + (3, 3)),
         -hat(pc)], -1)                        # [N, 3, 6]
    # broadcast-reduce, not @: the per-point [2,3]x[3,6] batched matmul
    # issues one tiny MXU op per point (the tiny-einsum trap, see
    # backend/ba._residual_and_jacobians); the VPU fusion is ~20x cheaper
    J = jnp.sum(Juv_pc[..., :, :, None] * Jpc[..., None, :, :],
                -2)                            # [N, 2, 6]
    return r, J


def _solve6_spd(H, g):
    """6x6 SPD solve via unrolled Cholesky: fuses into the surrounding GN
    graph instead of dispatching a LAPACK-style custom call per iteration
    (the GN loop runs ~tens of times per frame in the hot path)."""
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        s = H[i, i]
        for k in range(i):
            s = s - L[i][k] * L[i][k]
        L[i][i] = jnp.sqrt(jnp.clip(s, 1e-12, None))
        for j in range(i + 1, 6):
            s = H[j, i]
            for k in range(i):
                s = s - L[j][k] * L[i][k]
            L[j][i] = s / L[i][i]
    # forward substitution L y = g
    y = [None] * 6
    for i in range(6):
        s = g[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution L^T x = y
    x = [None] * 6
    for i in range(5, -1, -1):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


def _pnp_gauss_newton(R, t, X, uv, K, w, iters: int):
    """Masked GN refinement of (R, t) on weighted correspondences.

    UNROLLED (static trip count): the body is a chain of small batched ops;
    unrolling lets XLA fuse across iterations instead of paying fori_loop
    dispatch + a linear-solve custom call per iteration."""
    for _ in range(iters):
        r, J = _pnp_residual_jacobian(R, t, X, uv, K)
        ww = w[..., None]
        H = jnp.einsum("nik,nil->kl", J * ww[..., None], J)
        g = jnp.einsum("nik,ni->k", J, r * ww)
        H = H + 1e-6 * jnp.eye(6, dtype=H.dtype)
        xi = -_solve6_spd(H, g)
        dR = so3_exp(xi[3:])
        R, t = dR @ R, (dR @ t[..., None])[..., 0] + xi[:3]
    return R, t


def pnp_reprojection_error(R, t, X, uv, K):
    T = make_se3(R, t)
    proj, z = project_points(K, T, X)
    err = jnp.linalg.norm(proj - uv, axis=-1)
    return jnp.where(z > 0, err, _BIG)


@functools.partial(jax.jit, static_argnames=("num_hypotheses", "refine_iters"))
def solve_pnp_ransac(K, X, uv, valid, reproj_thresh, key,
                     num_hypotheses: int = 256, refine_iters: int = 10):
    """cv::solvePnPRansac equivalent.

    The reference calls it with hardcoded (iters=100, reproj=8.0, conf=.99)
    (tracker.cpp:309); hypothesis-parallel sampling replaces the sequential
    loop, followed by GN polish on the best hypothesis' inliers.

    Returns (RansacResult(model=T_cw [4, 4]), R, t).
    """
    idx = sample_minimal_sets(key, valid, num_hypotheses, 6)
    R0, t0 = jax.vmap(lambda i: solve_pnp_dlt(X[i], uv[i], K))(idx)
    err = jax.vmap(lambda R, t: pnp_reprojection_error(R, t, X, uv, K))(R0, t0)
    best, inliers, count = _select_best(err, valid, reproj_thresh)
    R_b, t_b = R0[best], t0[best]

    # Refine-reselect rounds: the best minimal hypothesis is only roughly
    # right, so its inlier set misses true inliers; a single polish on that
    # partial set under-converges (measured p90 pose error ~10x OpenCV's).
    # Re-thresholding between GN rounds walks the support out to the full
    # inlier set, and Huber IRLS weights (delta = thresh/4) keep borderline
    # outliers admitted by the loose gate (the reference hardcodes 8 px,
    # tracker.cpp:309) from dragging the converged pose — with hard 0/1
    # weights the loop has a measurable attractor that trades pose accuracy
    # for one extra near-threshold inlier.
    delta = reproj_thresh / 4.0

    R_ref, t_ref, w = R_b, t_b, inliers.astype(X.dtype)
    for _ in range(3):        # unrolled (see _pnp_gauss_newton)
        R_ref, t_ref = _pnp_gauss_newton(R_ref, t_ref, X, uv, K, w,
                                         refine_iters)
        err2 = pnp_reprojection_error(R_ref, t_ref, X, uv, K)
        mask2 = (err2 < reproj_thresh) & valid
        w = (mask2 * jnp.minimum(1.0, delta / jnp.clip(err2, 1e-6, None))
             ).astype(X.dtype)
    err_ref = pnp_reprojection_error(R_ref, t_ref, X, uv, K)
    inl_ref = (err_ref < reproj_thresh) & valid
    better = (_msac_score(err_ref, valid, reproj_thresh)
              <= _msac_score(err[best], valid, reproj_thresh))
    R_out = jnp.where(better, R_ref, R_b)
    t_out = jnp.where(better, t_ref, t_b)
    inl_out = jnp.where(better, inl_ref, inliers)
    return RansacResult(make_se3(R_out, t_out), inl_out, jnp.sum(inl_out))
