"""Hypothesis-parallel RANSAC vs OpenCV + synthetic ground truth
(SURVEY.md section 4: E/H/F estimation on synthetic correspondences with
known (R, t), RANSAC masks consistent under permutation)."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from ros2_mono_vo_tpu.geometry import project_points, pixel_to_normalized, make_se3
from ros2_mono_vo_tpu.ops.ransac import (
    find_homography_ransac, find_fundamental_ransac, find_essential_ransac,
    recover_pose, solve_pnp_ransac, solve_homography_dlt, solve_fundamental_8pt,
    sampson_error, homography_reproj_error, sample_minimal_sets,
)

K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
KEY = jax.random.PRNGKey(0)


def two_view_scene(rng, n=200, planar=False, outlier_frac=0.0, noise=0.3):
    """Synthetic scene with known relative pose. Returns uv1, uv2, T2 (cam2
    extrinsic, world == cam1), pts."""
    if planar:
        pts = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
                        np.full(n, 8.0)], -1).astype(np.float32)
    else:
        pts = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
                        rng.uniform(5, 15, n)], -1).astype(np.float32)
    R = Rotation.from_euler("xyz", [2, -4, 1], degrees=True).as_matrix().astype(np.float32)
    t = np.array([0.5, -0.05, 0.08], np.float32)
    T2 = np.asarray(make_se3(jnp.asarray(R), jnp.asarray(t)))
    uv1, _ = project_points(jnp.asarray(K), jnp.eye(4), jnp.asarray(pts))
    uv2, _ = project_points(jnp.asarray(K), jnp.asarray(T2), jnp.asarray(pts))
    uv1 = np.asarray(uv1) + rng.normal(0, noise, (n, 2))
    uv2 = np.asarray(uv2) + rng.normal(0, noise, (n, 2))
    n_out = int(n * outlier_frac)
    if n_out:
        uv2[:n_out] = rng.uniform(0, 640, (n_out, 2))
    return (uv1.astype(np.float32), uv2.astype(np.float32), T2, pts,
            np.arange(n) >= n_out)


class TestHomography:
    def test_planar_scene_with_outliers(self, rng):
        uv1, uv2, T2, pts, gt_inl = two_view_scene(rng, planar=True, outlier_frac=0.3)
        res = find_homography_ransac(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(len(uv1), bool), 3.0, KEY)
        inl = np.asarray(res.inliers)
        # recall of true inliers high, almost no outliers admitted
        assert inl[gt_inl].mean() > 0.9
        assert inl[~gt_inl].mean() < 0.05
        # model agrees with cv2 on inlier reprojection
        H_cv, _ = cv2.findHomography(uv1, uv2, cv2.RANSAC, 3.0)
        err_cv = np.asarray(homography_reproj_error(
            jnp.asarray(H_cv.astype(np.float32)), jnp.asarray(uv1), jnp.asarray(uv2)))
        err_ours = np.asarray(homography_reproj_error(
            res.model, jnp.asarray(uv1), jnp.asarray(uv2)))
        assert np.median(err_ours[gt_inl]) < max(1.5 * np.median(err_cv[gt_inl]), 1.0)

    def test_nonplanar_scores_lower_than_f(self, rng):
        """The H/F model-selection signal (initializer.cpp:77-110): for a
        general 3D scene with parallax, F should have clearly more inliers."""
        uv1, uv2, _, _, _ = two_view_scene(rng, planar=False)
        valid = jnp.ones(len(uv1), bool)
        h = find_homography_ransac(jnp.asarray(uv1), jnp.asarray(uv2), valid, 1.0, KEY)
        f = find_fundamental_ransac(jnp.asarray(uv1), jnp.asarray(uv2), valid, 1.0, KEY)
        score = float(h.count) / float(f.count)
        assert float(f.count) / len(uv1) > 0.5
        assert score < 0.56  # the reference's init gate would pass

    def test_planar_scores_higher_than_f_gate(self, rng):
        uv1, uv2, _, _, _ = two_view_scene(rng, planar=True)
        valid = jnp.ones(len(uv1), bool)
        h = find_homography_ransac(jnp.asarray(uv1), jnp.asarray(uv2), valid, 1.0, KEY)
        f = find_fundamental_ransac(jnp.asarray(uv1), jnp.asarray(uv2), valid, 1.0, KEY)
        assert float(h.count) / float(f.count) > 0.56  # init gate rejects planar


class TestFundamental:
    def test_epipolar_constraint(self, rng):
        uv1, uv2, T2, _, gt_inl = two_view_scene(rng, outlier_frac=0.2)
        res = find_fundamental_ransac(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(len(uv1), bool), 1.5, KEY)
        inl = np.asarray(res.inliers)
        assert inl[gt_inl].mean() > 0.85
        assert inl[~gt_inl].mean() < 0.08
        err = np.asarray(sampson_error(res.model, jnp.asarray(uv1), jnp.asarray(uv2)))
        assert np.median(err[gt_inl]) < 1.0

    def test_mask_stable_under_permutation(self, rng):
        uv1, uv2, _, _, _ = two_view_scene(rng, outlier_frac=0.2)
        valid = jnp.ones(len(uv1), bool)
        res1 = find_fundamental_ransac(jnp.asarray(uv1), jnp.asarray(uv2), valid, 1.5, KEY)
        perm = rng.permutation(len(uv1))
        res2 = find_fundamental_ransac(
            jnp.asarray(uv1[perm]), jnp.asarray(uv2[perm]), valid, 1.5, KEY)
        a = np.asarray(res1.inliers)[perm]
        b = np.asarray(res2.inliers)
        assert (a == b).mean() > 0.95


class TestEssential:
    def test_pose_recovery(self, rng):
        uv1, uv2, T2, pts, gt_inl = two_view_scene(rng, outlier_frac=0.15)
        valid = jnp.ones(len(uv1), bool)
        res = find_essential_ransac(
            jnp.asarray(K), jnp.asarray(uv1), jnp.asarray(uv2), valid, 1.0, KEY)
        xy1 = pixel_to_normalized(jnp.asarray(K), jnp.asarray(uv1))
        xy2 = pixel_to_normalized(jnp.asarray(K), jnp.asarray(uv2))
        R, t, front, votes = recover_pose(res.model, xy1, xy2, res.inliers)
        R_gt = T2[:3, :3]
        t_gt = T2[:3, 3] / np.linalg.norm(T2[:3, 3])
        dR = np.asarray(R) @ R_gt.T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 1.0
        t_ours = np.asarray(t)
        assert min(np.linalg.norm(t_ours - t_gt), np.linalg.norm(t_ours + t_gt)) < 0.05
        # chirality must be positive-dominant
        assert int(votes) > 0.7 * gt_inl.sum()

    def test_agrees_with_cv2(self, rng):
        uv1, uv2, T2, _, _ = two_view_scene(rng, noise=0.2)
        valid = jnp.ones(len(uv1), bool)
        res = find_essential_ransac(
            jnp.asarray(K), jnp.asarray(uv1), jnp.asarray(uv2), valid, 1.0, KEY)
        E_cv, _ = cv2.findEssentialMat(uv1, uv2, K.astype(np.float64),
                                       cv2.RANSAC, 0.99, 1.0)
        _, R_cv, t_cv, _ = cv2.recoverPose(E_cv, uv1, uv2, K.astype(np.float64))
        xy1 = pixel_to_normalized(jnp.asarray(K), jnp.asarray(uv1))
        xy2 = pixel_to_normalized(jnp.asarray(K), jnp.asarray(uv2))
        R, t, _, _ = recover_pose(res.model, xy1, xy2, res.inliers)
        dR = np.asarray(R) @ R_cv.T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 1.0


class TestPnP:
    def test_pose_with_outliers(self, rng):
        n = 150
        pts = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
                        rng.uniform(5, 15, n)], -1).astype(np.float32)
        R_gt = Rotation.from_euler("xyz", [5, 10, -3], degrees=True).as_matrix()
        t_gt = np.array([0.3, -0.2, 0.5])
        T_gt = np.asarray(make_se3(jnp.asarray(R_gt.astype(np.float32)),
                                   jnp.asarray(t_gt.astype(np.float32))))
        uv, _ = project_points(jnp.asarray(K), jnp.asarray(T_gt), jnp.asarray(pts))
        uv = np.asarray(uv) + rng.normal(0, 0.5, (n, 2)).astype(np.float32)
        n_out = 30
        uv[:n_out] = rng.uniform(0, 640, (n_out, 2)).astype(np.float32)
        res = solve_pnp_ransac(jnp.asarray(K), jnp.asarray(pts),
                               jnp.asarray(uv.astype(np.float32)),
                               jnp.ones(n, bool), 8.0, KEY)
        T = np.asarray(res.model)
        dR = T[:3, :3] @ R_gt.T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 0.5
        assert np.linalg.norm(T[:3, 3] - t_gt) < 0.05
        inl = np.asarray(res.inliers)
        assert inl[n_out:].mean() > 0.95
        assert inl[:n_out].mean() < 0.1

    def test_agrees_with_cv2_pnp(self, rng):
        n = 100
        pts = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
                        rng.uniform(5, 15, n)], -1).astype(np.float32)
        R_gt = Rotation.from_euler("xyz", [2, -6, 4], degrees=True).as_matrix()
        t_gt = np.array([0.1, 0.2, -0.3])
        T_gt = np.asarray(make_se3(jnp.asarray(R_gt.astype(np.float32)),
                                   jnp.asarray(t_gt.astype(np.float32))))
        uv, _ = project_points(jnp.asarray(K), jnp.asarray(T_gt), jnp.asarray(pts))
        uv = np.asarray(uv).astype(np.float32)
        ok, rvec, tvec, _ = cv2.solvePnPRansac(
            pts.astype(np.float64), uv.astype(np.float64), K.astype(np.float64),
            None, iterationsCount=100, reprojectionError=8.0)
        R_cv, _ = cv2.Rodrigues(rvec)
        res = solve_pnp_ransac(jnp.asarray(K), jnp.asarray(pts), jnp.asarray(uv),
                               jnp.ones(n, bool), 8.0, KEY)
        T = np.asarray(res.model)
        dR = T[:3, :3] @ R_cv.T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 0.2
        assert np.linalg.norm(T[:3, 3] - tvec.ravel()) < 0.02


class TestSampling:
    def test_minimal_sets_distinct_and_valid(self, rng):
        valid = np.zeros(100, bool)
        valid[20:80] = True
        idx = np.asarray(sample_minimal_sets(KEY, jnp.asarray(valid), 64, 8))
        assert idx.shape == (64, 8)
        for row in idx:
            assert len(set(row.tolist())) == 8
            assert all(valid[i] for i in row)

    def test_respects_mask_completely(self):
        valid = np.zeros(64, bool)
        valid[:12] = True
        idx = np.asarray(sample_minimal_sets(KEY, jnp.asarray(valid), 32, 4))
        assert (idx < 12).all()
