"""Output message construction — the reference's publish surface, framework-native.

Replaces reference `src/utils.cpp` message builders and the node's odometry
publisher, keeping byte-level/field-level behavior so downstream consumers of
the reference's topics can consume these dicts (or their serialized forms)
unchanged:

- ``odometry_msg``           <- affine3d_to_odometry_msg   (utils.cpp:85-144)
- ``transform_stamped_msg``  <- affine3d_to_transform_stamped_msg (utils.cpp:146-182)
- ``pointcloud2_msg``        <- points3d_to_pointcloud_msg (utils.cpp:184-243)
- ``apply_lost_covariance_growth`` <- publish_odom's lost-mode covariance
                                      inflation (mono_vo.cpp:177-190)
- ``draw_matched_points``    <- the match-visualization debug helper
                               (utils.cpp:14-83; the reference calls it from
                               commented-out imshow sites)

Conversions are batched jnp where they may run on device (pose/point axis
conversion, quaternions); message assembly is host-side numpy, since messages
exist only at the host I/O boundary (SURVEY.md section 7, stage 6).
"""

from __future__ import annotations

import numpy as np

from ros2_mono_vo_tpu.geometry.se3 import cv_pose_to_ros, cv_points_to_ros

# Base pose covariance diagonal hardcoded by the reference
# (utils.cpp:129-134): 0.1 m^2 position, 0.05 rad^2 rotation.
BASE_POSITION_COV = 0.1
BASE_ROTATION_COV = 0.05
# Twist covariance placeholders (utils.cpp:138-140).
TWIST_COV = 1e-3


def rotmat_to_quat(R: np.ndarray) -> np.ndarray:
    """Rotation matrix [..., 3, 3] -> unit quaternion [..., 4] as (x, y, z, w)
    — the tf2 component order used by the reference (utils.cpp:105-113).

    Branch-free Shepperd's method (vectorized over leading axes): compute all
    four candidate constructions, pick the best-conditioned per element.
    """
    R = np.asarray(R, np.float64)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidates, each valid when its pivot is the largest
    qw = np.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                   1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    qw = np.sqrt(np.maximum(qw, 1e-12)) * 0.5
    # candidate 0: pivot w
    c0 = np.stack([(m21 - m12), (m02 - m20), (m10 - m01)], axis=-1) \
        / (4.0 * qw[..., 0:1])
    # candidate 1: pivot x
    c1x = qw[..., 1]
    c1 = np.stack([(m01 + m10), (m02 + m20), (m21 - m12)], axis=-1) \
        / (4.0 * qw[..., 1:2])
    # candidate 2: pivot y
    c2 = np.stack([(m01 + m10), (m12 + m21), (m02 - m20)], axis=-1) \
        / (4.0 * qw[..., 2:3])
    # candidate 3: pivot z
    c3 = np.stack([(m02 + m20), (m12 + m21), (m10 - m01)], axis=-1) \
        / (4.0 * qw[..., 3:4])

    cand = np.stack([
        np.concatenate([c0, qw[..., 0:1]], axis=-1),                     # w pivot
        np.concatenate([c1x[..., None], c1], axis=-1),                   # x pivot
        np.stack([c2[..., 0], qw[..., 2], c2[..., 1], c2[..., 2]], -1),  # y pivot
        np.stack([c3[..., 0], c3[..., 1], qw[..., 3], c3[..., 2]], -1),  # z pivot
    ], axis=-2)                                                          # [...,4,4]
    pick = np.argmax(np.stack([tr, m00, m11, m22], axis=-1), axis=-1)
    q = np.take_along_axis(cand, pick[..., None, None].repeat(4, -1),
                           axis=-2)[..., 0, :]
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0
    return q * np.where(q[..., 3:4] < 0, -1.0, 1.0)


def _pose_cov_diag() -> np.ndarray:
    cov = np.zeros(36, np.float64)
    cov[0] = cov[7] = cov[14] = BASE_POSITION_COV
    cov[21] = cov[28] = cov[35] = BASE_ROTATION_COV
    return cov


def odometry_msg(T_wc_cv: np.ndarray, stamp: float,
                 frame_id: str = "odom",
                 child_frame_id: str = "base_link") -> dict:
    """nav_msgs/Odometry-shaped dict from a CV-axes T_wc pose.

    Mirrors affine3d_to_odometry_msg (utils.cpp:85-144): conjugate rotation +
    rotate translation into REP-103 axes, quaternion orientation, hardcoded
    base covariance diagonal, zero twist with placeholder covariance.
    """
    T_ros = np.asarray(cv_pose_to_ros(np.asarray(T_wc_cv, np.float32)))
    q = rotmat_to_quat(T_ros[:3, :3])
    twist_cov = np.zeros(36, np.float64)
    twist_cov[0] = twist_cov[7] = twist_cov[35] = TWIST_COV
    return {
        "header": {"stamp": float(stamp), "frame_id": frame_id},
        "child_frame_id": child_frame_id,
        "pose": {
            "position": T_ros[:3, 3].astype(np.float64),
            "orientation_xyzw": q,
            "covariance": _pose_cov_diag(),
        },
        "twist": {
            "linear": np.zeros(3), "angular": np.zeros(3),
            "covariance": twist_cov,
        },
    }


def apply_lost_covariance_growth(msg: dict, time_since_valid: float,
                                 growth_rate: float = 0.1) -> dict:
    """Lost-mode degradation (publish_odom, mono_vo.cpp:177-190): position
    diagonal += rate*dt, rotation diagonal += rate*dt*0.1. In place; returns msg."""
    inc = growth_rate * max(float(time_since_valid), 0.0)
    cov = msg["pose"]["covariance"]
    cov[[0, 7, 14]] += inc
    cov[[21, 28, 35]] += inc * 0.1
    return msg


def transform_stamped_msg(T_wc_cv: np.ndarray, stamp: float,
                          frame_id: str = "odom",
                          child_frame_id: str = "base_link") -> dict:
    """geometry_msgs/TransformStamped-shaped dict (utils.cpp:146-182)."""
    T_ros = np.asarray(cv_pose_to_ros(np.asarray(T_wc_cv, np.float32)))
    return {
        "header": {"stamp": float(stamp), "frame_id": frame_id},
        "child_frame_id": child_frame_id,
        "transform": {
            "translation": T_ros[:3, 3].astype(np.float64),
            "rotation_xyzw": rotmat_to_quat(T_ros[:3, :3]),
        },
    }


def pointcloud2_msg(points_cv: np.ndarray, stamp: float,
                    frame_id: str = "odom") -> dict:
    """sensor_msgs/PointCloud2-shaped dict with the reference's exact layout
    (utils.cpp:184-243): unordered (height=1), float32 x/y/z at offsets
    0/4/8, point_step 12, little-endian, per-point CV->ROS axis swap."""
    pts = np.asarray(points_cv, np.float32).reshape(-1, 3)
    pts_ros = np.asarray(cv_points_to_ros(pts), np.float32)
    data = np.ascontiguousarray(pts_ros, dtype="<f4").tobytes()
    return {
        "header": {"stamp": float(stamp), "frame_id": frame_id},
        "height": 1,
        "width": int(pts.shape[0]),
        "is_dense": True,
        "is_bigendian": False,
        "fields": [
            {"name": "x", "offset": 0, "datatype": "float32", "count": 1},
            {"name": "y", "offset": 4, "datatype": "float32", "count": 1},
            {"name": "z", "offset": 8, "datatype": "float32", "count": 1},
        ],
        "point_step": 12,
        "row_step": 12 * int(pts.shape[0]),
        "data": data,
    }


def draw_matched_points(image: np.ndarray, pts_prev: np.ndarray,
                        pts_cur: np.ndarray,
                        valid: np.ndarray | None = None,
                        radius: int = 3) -> np.ndarray:
    """Match/track visualization as an RGB uint8 image.

    The debug-viz equivalent of utils.cpp:14-83 (circles at matched points +
    motion segments), host-side numpy since it exists only for humans.
    Green circle = current point, red pixel trail = prev->cur segment.
    """
    img = np.asarray(image)
    if img.ndim == 2:
        rgb = np.stack([img, img, img], axis=-1)
    else:
        rgb = img.copy()
    rgb = np.clip(rgb, 0, 255).astype(np.uint8)
    h, w = rgb.shape[:2]
    pts_prev = np.asarray(pts_prev, np.float32).reshape(-1, 2)
    pts_cur = np.asarray(pts_cur, np.float32).reshape(-1, 2)
    if valid is None:
        valid = np.ones(len(pts_cur), bool)
    valid = np.asarray(valid, bool)

    yy, xx = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    ring = (np.abs(np.hypot(xx, yy) - radius) < 0.8)
    ry, rx = np.nonzero(ring)
    for (pu, pv), (cu, cv_), ok in zip(pts_prev, pts_cur, valid):
        if not ok:
            continue
        # trail: sample the segment densely and paint red
        n = max(int(np.hypot(cu - pu, cv_ - pv)) * 2, 2)
        us = np.linspace(pu, cu, n).round().astype(int)
        vs = np.linspace(pv, cv_, n).round().astype(int)
        m = (us >= 0) & (us < w) & (vs >= 0) & (vs < h)
        rgb[vs[m], us[m]] = (255, 64, 64)
        # current point: green ring
        cy = (ry - radius + int(round(cv_)))
        cx = (rx - radius + int(round(cu)))
        m = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)
        rgb[cy[m], cx[m]] = (64, 255, 64)
    return rgb
