"""Pinhole projection and reprojection error — batched, mask-aware.

Replaces cv::projectPoints-style math and the reference's (unused) metric
`compute_reprojection_error` (reference utils.cpp:245-256), which the new
framework promotes to a first-class test/bench metric (SURVEY.md section 4).
"""

from __future__ import annotations

import jax.numpy as jnp


def project_points(K: jnp.ndarray, T_cw: jnp.ndarray, pts_w: jnp.ndarray,
                   eps: float = 1e-6):
    """Project world points into a camera.

    Args:
      K: [3, 3] intrinsics.
      T_cw: [..., 4, 4] world->camera extrinsic.
      pts_w: [..., N, 3] world points.

    Returns:
      (uv [..., N, 2], z [..., N]) — pixel coords and camera-frame depth.
    """
    R, t = T_cw[..., :3, :3], T_cw[..., :3, 3]
    # broadcast-reduce, not @: under a hypothesis/keyframe batch the matmul
    # lowers to one tiny [N,3]x[3,3] MXU op per batch element (the
    # tiny-einsum trap, backend/ba._residual_and_jacobians); the VPU
    # fusion is far cheaper and exact
    pc = (jnp.sum(R[..., None, :, :] * pts_w[..., :, None, :], -1)
          + t[..., None, :])
    z = pc[..., 2]
    zs = jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
    x = pc[..., 0] / zs
    y = pc[..., 1] / zs
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    u = fx * x + K[0, 1] * y + cx
    v = fy * y + cy
    return jnp.stack([u, v], axis=-1), z


def pixel_to_normalized(K: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixels [..., 2] -> normalized camera coords [..., 2] (K^-1, no skew in
    the inverse path beyond the standard upper-triangular solve)."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    s = K[0, 1]
    y = (uv[..., 1] - cy) / fy
    x = (uv[..., 0] - cx - s * y) / fx
    return jnp.stack([x, y], axis=-1)


def reprojection_error(K: jnp.ndarray, T_cw: jnp.ndarray, pts_w: jnp.ndarray,
                       uv_obs: jnp.ndarray, mask: jnp.ndarray | None = None):
    """Mean L2 reprojection error over (optionally masked) observations.

    Returns (mean_err scalar, per_point_err [..., N]).
    """
    uv, _ = project_points(K, T_cw, pts_w)
    err = jnp.linalg.norm(uv - uv_obs, axis=-1)
    if mask is None:
        return jnp.mean(err), err
    m = mask.astype(err.dtype)
    total = jnp.sum(err * m)
    count = jnp.clip(jnp.sum(m), 1.0, None)
    return total / count, err
