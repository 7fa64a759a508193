"""Batched DLT triangulation with chirality filtering.

TPU-native replacement for cv::triangulatePoints +
cv::convertPointsFromHomogeneous and the two chirality loops in the reference
(`initializer.cpp:112-163`, `tracker.cpp:138-180`): all points triangulate in
one batched 4x4 symmetric eigendecomposition; the per-point chirality loop
becomes a mask.
"""

from __future__ import annotations

import jax.numpy as jnp

from ros2_mono_vo_tpu.ops.linalg import smallest_eigvec


def _smallest_eigvec_sym4(A: jnp.ndarray) -> jnp.ndarray:
    """Eigenvector of the smallest eigenvalue of symmetric [..., 4, 4]
    (batched Jacobi — see ops/linalg.py for why not jnp.linalg.eigh)."""
    return smallest_eigvec(A)


def triangulate_dlt(P1: jnp.ndarray, P2: jnp.ndarray,
                    uv1: jnp.ndarray, uv2: jnp.ndarray,
                    eps: float = 1e-9) -> jnp.ndarray:
    """DLT triangulation of point pairs.

    Args:
      P1, P2: [3, 4] projection matrices (K @ [R|t]).
      uv1, uv2: [N, 2] pixel correspondences.

    Returns:
      [N, 3] triangulated points in the frame the Ps are expressed in.
    """
    def rows(P, uv):
        u = uv[..., 0:1]
        v = uv[..., 1:2]
        r0 = u * P[2] - P[0]      # [N, 4]
        r1 = v * P[2] - P[1]
        return r0, r1

    a0, a1 = rows(P1, uv1)
    a2, a3 = rows(P2, uv2)
    A = jnp.stack([a0, a1, a2, a3], axis=-2)          # [N, 4, 4]
    # Row-normalize for conditioning, then take the null vector of A^T A.
    norms = jnp.linalg.norm(A, axis=-1, keepdims=True)
    A = A / jnp.clip(norms, eps, None)
    X = _smallest_eigvec_sym4(jnp.swapaxes(A, -1, -2) @ A)  # [N, 4]
    w = X[..., 3:4]
    ws = jnp.where(jnp.abs(w) < eps, jnp.where(w < 0, -eps, eps), w)
    return X[..., :3] / ws


def chirality_mask(T1_cw: jnp.ndarray, T2_cw: jnp.ndarray,
                   pts: jnp.ndarray, min_z: float = 0.0) -> jnp.ndarray:
    """Points in front of BOTH cameras (z > min_z in each camera frame).

    Matches the reference's tracker-side check (`tracker.cpp:155-161`): both
    cameras via full transform. (The initializer variant at
    `initializer.cpp:134-144` tests ref z directly because T1 = I there —
    numerically identical.)
    """
    def cam_z(T, p):
        R, t = T[..., :3, :3], T[..., :3, 3]
        return (p @ jnp.swapaxes(R, -1, -2) + t[..., None, :])[..., 2]

    return (cam_z(T1_cw, pts) > min_z) & (cam_z(T2_cw, pts) > min_z)


def reprojection_error(K: jnp.ndarray, T_cw: jnp.ndarray,
                       pts_w: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixel reprojection error of world points into one view ([..., N]).

    The reference defines exactly this metric (utils.cpp:245-256) but never
    calls it from the pipeline; here it gates triangulated landmarks."""
    pc = pts_w @ jnp.swapaxes(T_cw[..., :3, :3], -1, -2) + T_cw[..., None, :3, 3]
    z = jnp.where(jnp.abs(pc[..., 2]) < 1e-9, 1e-9, pc[..., 2])
    u = K[0, 0] * pc[..., 0] / z + K[0, 2]
    v = K[1, 1] * pc[..., 1] / z + K[1, 2]
    return jnp.hypot(u - uv[..., 0], v - uv[..., 1])


def triangulation_quality_mask(K: jnp.ndarray, T1_cw: jnp.ndarray,
                               T2_cw: jnp.ndarray, pts: jnp.ndarray,
                               uv1: jnp.ndarray, uv2: jnp.ndarray,
                               reproj_thresh: float | None,
                               min_parallax_deg: float | None) -> jnp.ndarray:
    """[N] bool quality mask for triangulated points (reprojection error in
    both views + minimum ray parallax). Applied to NEW landmark allocations
    only — reused landmark ids keep the reference's chirality-only rule
    (tracker.cpp:212-228), because long-lived landmarks are what anchors the
    monocular scale; culling their re-observations starves the tracked pool.
    """
    keep = jnp.ones(pts.shape[:-1], bool)
    if reproj_thresh is not None:
        e1 = reprojection_error(K, T1_cw, pts, uv1)
        e2 = reprojection_error(K, T2_cw, pts, uv2)
        keep = keep & (e1 < reproj_thresh) & (e2 < reproj_thresh)
    if min_parallax_deg is not None:
        c1 = -jnp.swapaxes(T1_cw[:3, :3], -1, -2) @ T1_cw[:3, 3]
        c2 = -jnp.swapaxes(T2_cw[:3, :3], -1, -2) @ T2_cw[:3, 3]
        r1 = pts - c1
        r2 = pts - c2
        cosang = jnp.sum(r1 * r2, -1) / jnp.clip(
            jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1),
            1e-12, None)
        keep = keep & (cosang < jnp.cos(jnp.deg2rad(min_parallax_deg)))
    return keep


def triangulate_and_filter(K: jnp.ndarray,
                           T1_cw: jnp.ndarray, T2_cw: jnp.ndarray,
                           uv1: jnp.ndarray, uv2: jnp.ndarray,
                           valid: jnp.ndarray | None = None,
                           max_depth: float = 1e6,
                           reproj_thresh: float | None = None,
                           min_parallax_deg: float | None = None):
    """Triangulate correspondences and build the keep-mask.

    Args:
      K: [3, 3].
      T1_cw, T2_cw: [4, 4] world->camera extrinsics of the two views.
      uv1, uv2: [N, 2] pixel correspondences.
      valid: optional [N] bool mask of real (non-padding) correspondences.
      reproj_thresh: if set, reject points reprojecting worse than this many
        pixels in EITHER view (kills wrong-match landmarks — measured to be
        the driver of map-scale runaway in the keyframe-dense regime).
      min_parallax_deg: if set, reject points whose viewing rays subtend a
        smaller angle (their depth is noise; one bad deep landmark pulls
        PnP scale for every later frame).

    Returns:
      (pts_w [N, 3], keep [N] bool) — world points; keep = valid & chirality
      & finite & bounded depth & quality gates.
    """
    P1 = K @ T1_cw[:3, :4]
    P2 = K @ T2_cw[:3, :4]
    pts = triangulate_dlt(P1, P2, uv1, uv2)
    keep = chirality_mask(T1_cw, T2_cw, pts)
    finite = jnp.all(jnp.isfinite(pts), axis=-1)
    bounded = jnp.linalg.norm(pts, axis=-1) < max_depth
    keep = keep & finite & bounded
    if reproj_thresh is not None:
        e1 = reprojection_error(K, T1_cw, pts, uv1)
        e2 = reprojection_error(K, T2_cw, pts, uv2)
        keep = keep & (e1 < reproj_thresh) & (e2 < reproj_thresh)
    if min_parallax_deg is not None:
        c1 = -jnp.swapaxes(T1_cw[:3, :3], -1, -2) @ T1_cw[:3, 3]
        c2 = -jnp.swapaxes(T2_cw[:3, :3], -1, -2) @ T2_cw[:3, 3]
        r1 = pts - c1
        r2 = pts - c2
        cosang = jnp.sum(r1 * r2, -1) / jnp.clip(
            jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1),
            1e-12, None)
        min_cos = jnp.cos(jnp.deg2rad(min_parallax_deg))
        keep = keep & (cosang < min_cos)
    if valid is not None:
        keep = keep & valid
    return pts, keep
