"""Geometry core vs closed-form / OpenCV oracles (SURVEY.md section 4:
unit tests of kernels against NumPy/SciPy/OpenCV oracles)."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from ros2_mono_vo_tpu.geometry import (
    se3_exp, se3_log, se3_inverse, so3_exp, so3_log, rodrigues, make_se3,
    rotation_angle, transform_points, cv_pose_to_ros, cv_points_to_ros,
    CV_TO_ROS_R, project_points, pixel_to_normalized, reprojection_error,
    triangulate_dlt, triangulate_and_filter, chirality_mask,
)

K_TEST = np.array([[718.856, 0.0, 607.1928],
                   [0.0, 718.856, 185.2157],
                   [0.0, 0.0, 1.0]], dtype=np.float32)


def random_pose(rng, t_scale=1.0):
    R = Rotation.random(random_state=int(rng.integers(1 << 30))).as_matrix()
    t = rng.normal(size=3) * t_scale
    T = np.eye(4, dtype=np.float64)
    T[:3, :3] = R
    T[:3, 3] = t
    return T.astype(np.float32)


class TestSO3:
    def test_exp_matches_cv_rodrigues(self, rng):
        w = rng.normal(size=(32, 3)).astype(np.float32)
        R_ours = np.asarray(so3_exp(jnp.asarray(w)))
        for i in range(32):
            R_cv, _ = cv2.Rodrigues(w[i].astype(np.float64))
            np.testing.assert_allclose(R_ours[i], R_cv, atol=1e-5)

    def test_exp_log_roundtrip(self, rng):
        w = rng.normal(size=(64, 3)).astype(np.float32)
        # keep |w| < pi for uniqueness
        w = w / np.linalg.norm(w, axis=-1, keepdims=True) * \
            rng.uniform(1e-4, 3.0, size=(64, 1)).astype(np.float32)
        w2 = np.asarray(so3_log(so3_exp(jnp.asarray(w))))
        np.testing.assert_allclose(w2, w, atol=1e-3)

    def test_log_near_identity_and_pi(self):
        np.testing.assert_allclose(np.asarray(so3_log(jnp.eye(3))), 0.0, atol=1e-5)
        w = np.array([0.0, 0.0, np.pi - 1e-4], dtype=np.float32)
        w2 = np.asarray(so3_log(so3_exp(jnp.asarray(w))))
        np.testing.assert_allclose(np.abs(w2), np.abs(w), atol=1e-2)

    def test_log_jacobian_finite_at_identity(self):
        # regression: jacfwd(so3_log . so3_exp) must stay finite at theta=0
        # (arccos at a clipped input of 1.0 has infinite derivative; the
        # small-angle branch must not route through it — pose-graph GN steps
        # go NaN otherwise, exactly at converged zero-residual edges).
        import jax
        f = lambda x: so3_log(so3_exp(x))
        for w in [np.zeros(3), np.array([1e-8, 0, 0]),
                  np.array([1e-4, 2e-5, -1e-5]), np.array([0.5, -0.3, 0.2])]:
            J = jax.jacfwd(f)(jnp.asarray(w, jnp.float32))
            assert np.all(np.isfinite(np.asarray(J))), w
        # at identity the jacobian of log(exp(.)) is the 3x3 identity
        J0 = np.asarray(jax.jacfwd(f)(jnp.zeros(3, jnp.float32)))
        np.testing.assert_allclose(J0, np.eye(3), atol=1e-3)

    def test_rotation_angle(self, rng):
        for _ in range(8):
            angle = rng.uniform(0.01, 3.0)
            axis = rng.normal(size=3)
            axis /= np.linalg.norm(axis)
            R = so3_exp(jnp.asarray((axis * angle).astype(np.float32)))
            assert np.asarray(rotation_angle(R)) == pytest.approx(angle, abs=1e-3)


class TestSE3:
    def test_inverse(self, rng):
        T = jnp.asarray(np.stack([random_pose(rng) for _ in range(16)]))
        TT = np.asarray(T @ se3_inverse(T))
        np.testing.assert_allclose(TT, np.broadcast_to(np.eye(4), TT.shape), atol=1e-5)

    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(32, 6)).astype(np.float32) * 0.8
        xi2 = np.asarray(se3_log(se3_exp(jnp.asarray(xi))))
        np.testing.assert_allclose(xi2, xi, atol=1e-3)

    def test_transform_points(self, rng):
        T = random_pose(rng)
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        ours = np.asarray(transform_points(jnp.asarray(T), jnp.asarray(pts)))
        ref = (T[:3, :3] @ pts.T).T + T[:3, 3]
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestAxisConvention:
    """Oracle = closed-form transforms at reference utils.cpp:89-103,227-235."""

    def test_rotation_matrix_is_orthonormal_permutation(self):
        C = np.asarray(CV_TO_ROS_R)
        np.testing.assert_allclose(C @ C.T, np.eye(3), atol=1e-7)
        # cv z-forward becomes ros x-forward
        np.testing.assert_allclose(C @ np.array([0, 0, 1.0]), [1, 0, 0], atol=1e-7)
        # cv x-right becomes ros -y
        np.testing.assert_allclose(C @ np.array([1.0, 0, 0]), [0, -1, 0], atol=1e-7)

    def test_pose_conjugation(self, rng):
        T = random_pose(rng)
        out = np.asarray(cv_pose_to_ros(jnp.asarray(T)))
        C = np.asarray(CV_TO_ROS_R)
        np.testing.assert_allclose(out[:3, :3], C @ T[:3, :3] @ C.T, atol=1e-5)
        np.testing.assert_allclose(out[:3, 3], C @ T[:3, 3], atol=1e-5)

    def test_pointcloud_axis_swap(self, rng):
        p = rng.normal(size=(10, 3)).astype(np.float32)
        out = np.asarray(cv_points_to_ros(jnp.asarray(p)))
        np.testing.assert_allclose(out, np.stack([p[:, 2], -p[:, 0], -p[:, 1]], -1),
                                   atol=1e-6)


class TestProjection:
    def test_vs_cv_project(self, rng):
        T_cw = random_pose(rng, t_scale=0.5)
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        pts[:, 2] += 10.0  # in front
        pts_w = pts
        uv, z = project_points(jnp.asarray(K_TEST), jnp.asarray(T_cw), jnp.asarray(pts_w))
        rvec, _ = cv2.Rodrigues(T_cw[:3, :3].astype(np.float64))
        uv_cv, _ = cv2.projectPoints(
            pts_w.astype(np.float64), rvec, T_cw[:3, 3].astype(np.float64),
            K_TEST.astype(np.float64), None)
        np.testing.assert_allclose(np.asarray(uv), uv_cv[:, 0, :], rtol=1e-4, atol=2e-2)

    def test_pixel_to_normalized_roundtrip(self, rng):
        uv = rng.uniform(0, 1000, size=(64, 2)).astype(np.float32)
        xy = np.asarray(pixel_to_normalized(jnp.asarray(K_TEST), jnp.asarray(uv)))
        u2 = xy[:, 0] * K_TEST[0, 0] + K_TEST[0, 2]
        v2 = xy[:, 1] * K_TEST[1, 1] + K_TEST[1, 2]
        np.testing.assert_allclose(np.stack([u2, v2], -1), uv, rtol=1e-5, atol=1e-2)

    def test_reprojection_error_masked(self, rng):
        T = jnp.eye(4)
        pts = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32) + np.array([0, 0, 5]))
        uv, _ = project_points(jnp.asarray(K_TEST), T, pts)
        uv_noisy = uv.at[0].add(100.0)
        mask = jnp.arange(8) != 0
        mean_err, per = reprojection_error(jnp.asarray(K_TEST), T, pts, uv_noisy, mask)
        assert float(mean_err) < 1e-3
        assert float(per[0]) > 50.0


class TestTriangulation:
    def _scene(self, rng, n=100):
        pts_w = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
        pts_w[:, 2] += 12.0
        T1 = np.eye(4, dtype=np.float32)
        T2 = np.eye(4, dtype=np.float32)
        T2[:3, 3] = [-1.0, 0.1, 0.0]  # baseline
        uv1, _ = project_points(jnp.asarray(K_TEST), jnp.asarray(T1), jnp.asarray(pts_w))
        uv2, _ = project_points(jnp.asarray(K_TEST), jnp.asarray(T2), jnp.asarray(pts_w))
        return pts_w, T1, T2, np.asarray(uv1), np.asarray(uv2)

    def test_dlt_vs_cv(self, rng):
        pts_w, T1, T2, uv1, uv2 = self._scene(rng)
        P1 = K_TEST @ T1[:3]
        P2 = K_TEST @ T2[:3]
        ours = np.asarray(triangulate_dlt(
            jnp.asarray(P1), jnp.asarray(P2), jnp.asarray(uv1), jnp.asarray(uv2)))
        X = cv2.triangulatePoints(P1.astype(np.float64), P2.astype(np.float64),
                                  uv1.T.astype(np.float64), uv2.T.astype(np.float64))
        cv_pts = (X[:3] / X[3]).T
        np.testing.assert_allclose(ours, cv_pts, rtol=1e-2, atol=2e-2)
        np.testing.assert_allclose(ours, pts_w, rtol=1e-2, atol=5e-2)

    def test_chirality(self, rng):
        pts_w, T1, T2, uv1, uv2 = self._scene(rng)
        pts_behind = pts_w.copy()
        pts_behind[:10, 2] = -5.0
        mask = np.asarray(chirality_mask(jnp.asarray(T1), jnp.asarray(T2),
                                         jnp.asarray(pts_behind)))
        assert not mask[:10].any()
        assert mask[10:].all()

    def test_triangulate_and_filter(self, rng):
        pts_w, T1, T2, uv1, uv2 = self._scene(rng)
        valid = np.ones(len(uv1), bool)
        valid[:5] = False
        pts, keep = triangulate_and_filter(
            jnp.asarray(K_TEST), jnp.asarray(T1), jnp.asarray(T2),
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(valid))
        keep = np.asarray(keep)
        assert not keep[:5].any()
        assert keep[5:].all()
        np.testing.assert_allclose(np.asarray(pts)[keep], pts_w[keep], rtol=1e-2, atol=5e-2)

    def test_jit_compiles_once(self, rng):
        pts_w, T1, T2, uv1, uv2 = self._scene(rng, n=64)
        f = jax.jit(triangulate_and_filter)
        out1 = f(jnp.asarray(K_TEST), jnp.asarray(T1), jnp.asarray(T2),
                 jnp.asarray(uv1), jnp.asarray(uv2))
        out2 = f(jnp.asarray(K_TEST), jnp.asarray(T1), jnp.asarray(T2),
                 jnp.asarray(uv1) + 0.1, jnp.asarray(uv2))
        assert np.isfinite(np.asarray(out1[0])).all()
        assert np.isfinite(np.asarray(out2[0])).all()
