"""Output message construction vs the reference's utils.cpp behavior."""

import numpy as np

from ros2_mono_vo_tpu.utils.messages import (
    rotmat_to_quat, odometry_msg, transform_stamped_msg, pointcloud2_msg,
    apply_lost_covariance_growth, draw_matched_points,
    BASE_POSITION_COV, BASE_ROTATION_COV)
from ros2_mono_vo_tpu.geometry.se3 import rodrigues


def _random_rot(rng):
    w = rng.normal(size=3)
    return np.asarray(rodrigues(w.astype(np.float32)), np.float64)


def _quat_to_rot(q):
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def test_rotmat_to_quat_roundtrip(rng):
    for _ in range(50):
        R = _random_rot(rng)
        q = rotmat_to_quat(R)
        assert abs(np.linalg.norm(q) - 1) < 1e-6
        np.testing.assert_allclose(_quat_to_rot(q), R, atol=1e-5)
    # batched
    Rs = np.stack([_random_rot(rng) for _ in range(8)])
    qs = rotmat_to_quat(Rs)
    for R, q in zip(Rs, qs):
        np.testing.assert_allclose(_quat_to_rot(q), R, atol=1e-5)


def test_rotmat_to_quat_degenerate():
    # identity and 180-degree rotations stress every pivot branch
    np.testing.assert_allclose(rotmat_to_quat(np.eye(3)), [0, 0, 0, 1],
                               atol=1e-6)
    for axis in range(3):
        R = -np.eye(3)
        R[axis, axis] = 1.0
        q = rotmat_to_quat(R)
        np.testing.assert_allclose(_quat_to_rot(q), R, atol=1e-5)


def test_odometry_msg_covariance_and_axes(rng):
    # CV +z forward translation -> ROS +x forward (utils.cpp:90-93)
    T = np.eye(4)
    T[:3, 3] = [0.0, 0.0, 2.5]
    msg = odometry_msg(T, stamp=1.5, frame_id="odom", child_frame_id="cam")
    np.testing.assert_allclose(msg["pose"]["position"], [2.5, 0, 0], atol=1e-5)
    cov = msg["pose"]["covariance"]
    assert cov.shape == (36,)
    # reference's hardcoded diagonal (utils.cpp:129-134)
    np.testing.assert_allclose(cov[[0, 7, 14]], BASE_POSITION_COV)
    np.testing.assert_allclose(cov[[21, 28, 35]], BASE_ROTATION_COV)
    np.testing.assert_allclose(msg["twist"]["covariance"][[0, 7, 35]], 1e-3)
    assert msg["child_frame_id"] == "cam"


def test_lost_covariance_growth():
    # publish_odom lost-mode math (mono_vo.cpp:177-190)
    msg = odometry_msg(np.eye(4), stamp=0.0)
    apply_lost_covariance_growth(msg, time_since_valid=3.0, growth_rate=0.1)
    cov = msg["pose"]["covariance"]
    np.testing.assert_allclose(cov[[0, 7, 14]], BASE_POSITION_COV + 0.3)
    np.testing.assert_allclose(cov[[21, 28, 35]], BASE_ROTATION_COV + 0.03)


def test_transform_stamped_matches_odometry(rng):
    T = np.eye(4)
    T[:3, :3] = _random_rot(rng)
    T[:3, 3] = rng.normal(size=3)
    om = odometry_msg(T, stamp=2.0)
    tm = transform_stamped_msg(T, stamp=2.0)
    np.testing.assert_allclose(tm["transform"]["translation"],
                               om["pose"]["position"], atol=1e-6)
    np.testing.assert_allclose(tm["transform"]["rotation_xyzw"],
                               om["pose"]["orientation_xyzw"], atol=1e-6)


def test_pointcloud2_layout(rng):
    pts = rng.normal(size=(17, 3)).astype(np.float32)
    msg = pointcloud2_msg(pts, stamp=0.0)
    assert msg["width"] == 17 and msg["height"] == 1
    assert msg["point_step"] == 12 and msg["row_step"] == 17 * 12
    data = np.frombuffer(msg["data"], "<f4").reshape(17, 3)
    # per-point axis swap (utils.cpp:227-235): ROS x = CV z, y = -x, z = -y
    np.testing.assert_allclose(data[:, 0], pts[:, 2], atol=1e-6)
    np.testing.assert_allclose(data[:, 1], -pts[:, 0], atol=1e-6)
    np.testing.assert_allclose(data[:, 2], -pts[:, 1], atol=1e-6)


def test_draw_matched_points(rng):
    img = rng.uniform(0, 255, (64, 96)).astype(np.float32)
    prev = np.array([[10.0, 10.0], [50.0, 30.0]])
    cur = prev + 5.0
    out = draw_matched_points(img, prev, cur)
    assert out.shape == (64, 96, 3) and out.dtype == np.uint8
    # green ring around current points, red trail between
    assert (out[:, :, 1] == 255).any()
    assert (out[:, :, 0] == 255).any()
    # invalid mask suppresses drawing
    out2 = draw_matched_points(img, prev, cur, valid=np.zeros(2, bool))
    assert not (out2[:, :, 1] == 255).any()
