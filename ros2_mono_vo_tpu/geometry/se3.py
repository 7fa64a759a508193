"""SE(3) / SO(3) utilities as pure, batched jnp functions.

Replaces the reference's cv::Affine3d / cv::Rodrigues usage (reference
`tracker.cpp:314-316`, `utils.cpp:85-143`). Everything is f32, shaped for
vmap: functions take either a single element or map cleanly under vmap.

Conventions (identical to the reference):
  - `T_wc` maps camera-frame points to world ("pose of camera in world").
  - `T_cw = inv(T_wc)` is the extrinsic used for projection.
  - CV camera axes: +z forward, +x right, +y down. Output (ROS/world
    visualization) axes: +x forward, +y left, +z up. The fixed change of
    basis is `CV_TO_ROS_R` (reference `utils.cpp:94-103`).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-9

# Fixed CV->ROS axis permutation (reference utils.cpp:94-99):
# ros_x = cv_z, ros_y = -cv_x, ros_z = -cv_y.
CV_TO_ROS_R = jnp.array(
    [[0.0, 0.0, 1.0],
     [-1.0, 0.0, 0.0],
     [0.0, -1.0, 0.0]], dtype=jnp.float32)


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: [..., 3] -> [..., 3, 3] skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [jnp.stack([zero, -wz, wy], -1),
         jnp.stack([wz, zero, -wx], -1),
         jnp.stack([-wy, wx, zero], -1)], -2)


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: [..., 3, 3] -> [..., 3]."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], -1)


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula: axis-angle [..., 3] -> rotation [..., 3, 3].

    Taylor-guarded so it is differentiable and finite at theta -> 0.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    W = hat(w)
    W2 = W @ W
    # sin(t)/t and (1-cos t)/t^2 with small-angle series
    a = jnp.where(theta2 > 1e-8, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    b = jnp.where(theta2 > 1e-8, (1.0 - jnp.cos(theta)) / (theta2 + _EPS),
                  0.5 - theta2 / 24.0)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def rodrigues(w: jnp.ndarray) -> jnp.ndarray:
    """cv::Rodrigues equivalent (rvec -> R), see reference tracker.cpp:315."""
    return so3_exp(w)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation [..., 3, 3] -> axis-angle [..., 3].

    Stable for small angles; for angles near pi it uses the diagonal form.
    Written so forward/reverse-mode derivatives stay finite at theta -> 0:
    the branch decision and the small-angle series use sin^2(theta) (a
    polynomial in R's entries), and the arccos input is clamped away from
    +-1 so its derivative never blows up on the path jacfwd traces.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w_skew = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin(theta) * axis
    sin2 = jnp.sum(w_skew * w_skew, axis=-1)          # = sin^2(theta)
    small = cos_t > 1.0 - 1e-6
    near_pi = cos_t < -1.0 + 5e-7
    cos_mid = jnp.clip(cos_t, -1.0 + 1e-7, 1.0 - 1e-7)
    theta_mid = jnp.arccos(cos_mid)
    sin_mid = jnp.sqrt(1.0 - cos_mid * cos_mid)
    theta = jnp.where(small, jnp.sqrt(jnp.clip(sin2, 0.0, None) + _EPS),
                      theta_mid)
    # generic: w = theta / (2 sin theta) * vee(R - R^T); small-angle series
    # theta/sin(theta) = 1 + s/6 + 7 s^2/360 with s = sin^2(theta)
    scale = jnp.where(small, 1.0 + sin2 / 6.0 + 7.0 * sin2 * sin2 / 360.0,
                      theta_mid / sin_mid)
    w_generic = w_skew * scale[..., None]
    # near pi: axis from diagonal of (R + I)/2 = axis axis^T * (1 - cos) + ...
    B = (R + jnp.swapaxes(R, -1, -2)) * 0.5  # symmetric part
    diag = jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]], -1)
    axis_sq = jnp.clip((diag - cos_t[..., None]) / jnp.clip(1.0 - cos_t[..., None], _EPS, None), 0.0, None)
    axis = jnp.sqrt(axis_sq)
    # fix signs using the off-diagonal terms of the skew part where possible,
    # else the symmetric part
    sign_src = jnp.where(jnp.abs(w_skew) > 1e-6, jnp.sign(w_skew), 1.0)
    # consistency of relative signs via symmetric off-diagonals
    sxy = jnp.sign(B[..., 0, 1] + _EPS)
    sxz = jnp.sign(B[..., 0, 2] + _EPS)
    axis_pi = axis * jnp.stack(
        [jnp.ones_like(sxy), sxy, sxz], -1) * sign_src[..., 0:1]
    norm = jnp.linalg.norm(axis_pi, axis=-1, keepdims=True)
    axis_pi = axis_pi / jnp.clip(norm, _EPS, None)
    w_pi = axis_pi * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def rotation_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Angle of rotation in radians: acos((tr(R)-1)/2), clipped.

    Matches the reference keyframe-motion test (tracker.cpp:104-110).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0))


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) exp: [..., 6] (v, w) -> [..., 4, 4]."""
    v, w = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    W = hat(w)
    W2 = W @ W
    R = so3_exp(w)
    b = jnp.where(theta2 > 1e-8, (1.0 - jnp.cos(theta)) / (theta2 + _EPS),
                  0.5 - theta2 / 24.0)
    c = jnp.where(theta2 > 1e-8, (theta - jnp.sin(theta)) / (theta2 * theta + _EPS),
                  1.0 / 6.0 - theta2 / 120.0)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), R.shape)
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    t = (V @ v[..., None])[..., 0]
    return make_se3(R, t)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """[..., 4, 4] -> [..., 6] (v, w)."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    W = hat(w)
    W2 = W @ W
    # V^{-1} = I - W/2 + (1/theta^2)(1 - theta sin / (2(1-cos))) W^2
    half_theta = 0.5 * theta
    cot = jnp.where(
        theta2 > 1e-8,
        (1.0 - half_theta * jnp.cos(half_theta) / jnp.clip(jnp.sin(half_theta), _EPS, None))
        / jnp.clip(theta2, _EPS, None),
        1.0 / 12.0 + theta2 / 720.0)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), R.shape)
    Vinv = eye - 0.5 * W + cot[..., None, None] * W2
    v = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([v, w], axis=-1)


def make_se3(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble [..., 4, 4] from R [..., 3, 3], t [..., 3]."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,))
    return jnp.concatenate([top, bottom[..., None, :]], axis=-2)


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of [..., 4, 4] rigid transforms.

    Replaces cv::Affine3d::inv (e.g. reference tracker.cpp:316,
    initializer.cpp:283: pose_wc = (R_cw, t_cw)^-1).
    """
    R, t = T[..., :3, :3], T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_se3(Rt, -(Rt @ t[..., None])[..., 0])


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply [..., 4, 4] to points [..., N, 3] -> [..., N, 3]."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def cv_pose_to_ros(T_wc_cv: jnp.ndarray) -> jnp.ndarray:
    """Convert a CV-frame pose into ROS/world display axes.

    Mirrors reference utils.cpp:89-103: t' = C t, R' = C R C^T with
    C = CV_TO_ROS_R (a conjugation, so it stays a valid rotation).
    """
    C = CV_TO_ROS_R.astype(T_wc_cv.dtype)
    R, t = T_wc_cv[..., :3, :3], T_wc_cv[..., :3, 3]
    return make_se3(C @ R @ C.T, (C @ t[..., None])[..., 0])


def cv_points_to_ros(pts: jnp.ndarray) -> jnp.ndarray:
    """Per-point axis swap used for the pointcloud export
    (reference utils.cpp:227-235): (x,y,z)_cv -> (z, -x, -y)."""
    return jnp.stack([pts[..., 2], -pts[..., 0], -pts[..., 1]], axis=-1)
