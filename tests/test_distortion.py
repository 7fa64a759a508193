"""Plumb-bob distortion model (geometry/distortion.py) and its use in PnP.

The reference consumes distortion coefficients in exactly one place:
cv::solvePnPRansac(..., d_) at tracker.cpp:309 (latched from CameraInfo at
mono_vo.cpp:204-207). Oracles: cv2.projectPoints / cv2.undistortPoints /
cv2.solvePnPRansac with the same coefficients.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from ros2_mono_vo_tpu.geometry.distortion import (distort_pixels,
                                                  undistort_pixels)

K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1]], np.float32)
D = np.array([-0.28, 0.07, 1e-4, -2e-4, 0.0], np.float32)  # EuRoC-like


def _rand_points(rng, n=200):
    """3D points in front of the camera, projecting within the image."""
    xyz = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                    rng.uniform(4.0, 12.0, n)], axis=1).astype(np.float64)
    return xyz


def test_distort_matches_cv2_projectPoints():
    rng = np.random.default_rng(0)
    xyz = _rand_points(rng)
    uv_cv, _ = cv2.projectPoints(xyz, np.zeros(3), np.zeros(3),
                                 K.astype(np.float64), D.astype(np.float64))
    uv_cv = uv_cv.reshape(-1, 2)
    # ideal pinhole projection then our distortion
    pin = (K @ (xyz / xyz[:, 2:]).T).T[:, :2]
    ours = np.asarray(distort_pixels(jnp.asarray(K), jnp.asarray(pin, jnp.float32),
                                     jnp.asarray(D)))
    np.testing.assert_allclose(ours, uv_cv, atol=0.02)


def test_undistort_matches_cv2_undistortPoints():
    rng = np.random.default_rng(1)
    xyz = _rand_points(rng)
    uv_d, _ = cv2.projectPoints(xyz, np.zeros(3), np.zeros(3),
                                K.astype(np.float64), D.astype(np.float64))
    uv_d = uv_d.reshape(-1, 2).astype(np.float32)
    und_cv = cv2.undistortPoints(uv_d.reshape(-1, 1, 2), K, D, P=K).reshape(-1, 2)
    ours = np.asarray(undistort_pixels(jnp.asarray(K), jnp.asarray(uv_d),
                                       jnp.asarray(D)))
    np.testing.assert_allclose(ours, und_cv, atol=0.05)


def test_undistort_zero_d_is_identity():
    rng = np.random.default_rng(2)
    uv = rng.uniform(0, 600, (64, 2)).astype(np.float32)
    out = np.asarray(undistort_pixels(jnp.asarray(K), jnp.asarray(uv),
                                      jnp.zeros(5, jnp.float32)))
    np.testing.assert_allclose(out, uv, atol=1e-4)


def test_pnp_with_distortion_matches_cv2():
    """track_step's PnP path: undistort-then-pinhole-PnP must recover the
    same pose cv2.solvePnPRansac gets from (distorted pixels, d)."""
    import jax
    from ros2_mono_vo_tpu.ops.ransac import solve_pnp_ransac

    rng = np.random.default_rng(3)
    xyz = _rand_points(rng, 256)
    R_gt, _ = cv2.Rodrigues(np.array([0.05, -0.1, 0.02]))
    t_gt = np.array([0.3, -0.1, 0.5])
    xyz_w = (xyz - t_gt) @ R_gt  # world points s.t. cam coords = xyz

    uv_d, _ = cv2.projectPoints(xyz, np.zeros(3), np.zeros(3),
                                K.astype(np.float64), D.astype(np.float64))
    uv_d = uv_d.reshape(-1, 2).astype(np.float32)

    ok, rvec, tvec, _ = cv2.solvePnPRansac(
        xyz_w, uv_d.astype(np.float64), K.astype(np.float64),
        D.astype(np.float64), iterationsCount=100, reprojectionError=8.0,
        confidence=0.99)
    assert ok
    R_cv, _ = cv2.Rodrigues(rvec)

    uv_u = undistort_pixels(jnp.asarray(K), jnp.asarray(uv_d), jnp.asarray(D))
    pnp = solve_pnp_ransac(jnp.asarray(K), jnp.asarray(xyz_w, jnp.float32),
                           uv_u, jnp.ones(len(xyz_w), bool), 8.0,
                           jax.random.PRNGKey(0), num_hypotheses=256,
                           refine_iters=10)
    T_cw = np.asarray(pnp.model)
    np.testing.assert_allclose(T_cw[:3, :3], R_cv, atol=5e-3)
    np.testing.assert_allclose(T_cw[:3, 3], tvec.ravel(), atol=2e-2)
    # and WITHOUT undistortion the recovered pose must be measurably worse,
    # i.e. the coefficients are not dead weight
    pnp_raw = solve_pnp_ransac(jnp.asarray(K), jnp.asarray(xyz_w, jnp.float32),
                               jnp.asarray(uv_d), jnp.ones(len(xyz_w), bool),
                               8.0, jax.random.PRNGKey(0), num_hypotheses=256,
                               refine_iters=10)
    err_und = np.linalg.norm(np.asarray(pnp.model)[:3, 3] - tvec.ravel())
    err_raw = np.linalg.norm(np.asarray(pnp_raw.model)[:3, 3] - tvec.ravel())
    assert err_und < err_raw
