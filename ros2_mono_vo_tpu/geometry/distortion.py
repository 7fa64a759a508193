"""Plumb-bob (Brown-Conrady) lens distortion: the model behind the
reference's 1x5 `d_` coefficient vector (latched from CameraInfo at
`mono_vo.cpp:204-207` and consumed only by `cv::solvePnPRansac` at
`tracker.cpp:309` — everywhere else the input is assumed rectified,
SURVEY.md quirks).

Coefficients follow OpenCV's ordering: d = (k1, k2, p1, p2, k3).

TPU-native usage: instead of evaluating the distortion model inside every
RANSAC hypothesis x point residual (the OpenCV path), observed pixels are
undistorted ONCE per frame (a fixed-point iteration, batched over points)
and PnP runs in ideal pinhole coordinates — mathematically equivalent
correspondences, O(N) instead of O(B*N) distortion math per frame.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def distort_normalized(xy: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Apply plumb-bob distortion to ideal normalized coords.

    xy: [..., 2] ideal (undistorted) normalized camera coords.
    d: [5] = (k1, k2, p1, p2, k3).
    Returns distorted normalized coords [..., 2].
    """
    k1, k2, p1, p2, k3 = d[0], d[1], d[2], d[3], d[4]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def distort_pixels(K: jnp.ndarray, uv_ideal: jnp.ndarray,
                   d: jnp.ndarray) -> jnp.ndarray:
    """Ideal pinhole pixels -> distorted pixels (cv::projectPoints model)."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    x = (uv_ideal[..., 0] - cx) / fx
    y = (uv_ideal[..., 1] - cy) / fy
    xyd = distort_normalized(jnp.stack([x, y], -1), d)
    return jnp.stack([fx * xyd[..., 0] + cx, fy * xyd[..., 1] + cy], -1)


def undistort_pixels(K: jnp.ndarray, uv: jnp.ndarray, d: jnp.ndarray,
                     iters: int = 8) -> jnp.ndarray:
    """Observed (distorted) pixels -> ideal pinhole pixels.

    Fixed-point inversion of the plumb-bob model (the same scheme as
    cv::undistortPoints): x <- (xd - tangential(x)) / radial(x), batched over
    points, a static `iters`-step fori_loop. With d = 0 this is exactly the
    identity (radial = 1, tangential = 0), so callers can thread a zero
    vector unconditionally — no branching in the jitted graph.
    """
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    xd = (uv[..., 0] - cx) / fx
    yd = (uv[..., 1] - cy) / fy
    k1, k2, p1, p2, k3 = d[0], d[1], d[2], d[3], d[4]

    def body(_, xy):
        x, y = xy
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        radial = jnp.where(jnp.abs(radial) < 1e-6, 1e-6, radial)
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        return (xd - dx) / radial, (yd - dy) / radial

    x, y = jax.lax.fori_loop(0, iters, body, (xd, yd))
    return jnp.stack([fx * x + cx, fy * y + cy], -1)
