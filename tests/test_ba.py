"""Bundle adjustment vs ground truth + golden single-vs-distributed checks
(SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from ros2_mono_vo_tpu.geometry import se3_inverse, project_points, make_se3
from ros2_mono_vo_tpu.backend.ba import BAProblem, bundle_adjust, build_normal_equations
from ros2_mono_vo_tpu.backend.window import extract_window, apply_window

K = np.array([[400.0, 0, 160], [0, 400.0, 120], [0, 0, 1]], np.float32)


def synth_ba_problem(rng, M=6, P=128, N=160, pose_noise=0.02, lm_noise=0.05,
                     px_noise=0.3, outlier_frac=0.0):
    """Scripted cameras observing a random cloud; noisy initial estimates."""
    pts = np.stack([rng.uniform(-4, 4, P), rng.uniform(-3, 3, P),
                    rng.uniform(8, 16, P)], -1).astype(np.float32)
    T_cw_gt = []
    for i in range(M):
        R = Rotation.from_euler("xyz", rng.normal(0, 2, 3), degrees=True).as_matrix()
        t = np.array([0.4 * i + rng.normal(0, 0.05), rng.normal(0, 0.05),
                      rng.normal(0, 0.05)])
        T_cw_gt.append(np.asarray(make_se3(jnp.asarray(R.astype(np.float32)),
                                           jnp.asarray(t.astype(np.float32)))))
    T_cw_gt = np.stack(T_cw_gt)

    obs_uv = np.zeros((M, N, 2), np.float32)
    obs_lm = np.full((M, N), -1, np.int32)
    obs_mask = np.zeros((M, N), bool)
    for mi in range(M):
        uv, z = project_points(jnp.asarray(K), jnp.asarray(T_cw_gt[mi]),
                               jnp.asarray(pts))
        uv = np.asarray(uv)
        z = np.asarray(z)
        inside = (z > 0) & (uv[:, 0] > 0) & (uv[:, 0] < 320) & \
                 (uv[:, 1] > 0) & (uv[:, 1] < 240)
        take = np.nonzero(inside)[0][:N]
        n = len(take)
        obs_uv[mi, :n] = uv[take] + rng.normal(0, px_noise, (n, 2))
        obs_lm[mi, :n] = take
        obs_mask[mi, :n] = True
        n_out = int(n * outlier_frac)
        if n_out:
            sel = rng.choice(n, n_out, replace=False)
            obs_uv[mi, sel] += rng.uniform(20, 80, (n_out, 2))

    # noisy initialization (keep the two gauge poses exact)
    T_cw_init = T_cw_gt.copy()
    for mi in range(2, M):
        dR = Rotation.from_rotvec(rng.normal(0, pose_noise, 3)).as_matrix()
        T_cw_init[mi][:3, :3] = dR @ T_cw_init[mi][:3, :3]
        T_cw_init[mi][:3, 3] += rng.normal(0, pose_noise * 5, 3)
    pts_init = pts + rng.normal(0, lm_noise, pts.shape).astype(np.float32)

    prob = BAProblem(
        T_cw=jnp.asarray(T_cw_init), lm_xyz=jnp.asarray(pts_init),
        obs_uv=jnp.asarray(obs_uv), obs_lm=jnp.asarray(obs_lm),
        obs_mask=jnp.asarray(obs_mask), K=jnp.asarray(K),
        pose_fixed=jnp.asarray(np.arange(M) < 2))
    return prob, T_cw_gt, pts


class TestBA:
    def test_cost_decreases_and_recovers_poses(self, rng):
        prob, T_gt, pts_gt = synth_ba_problem(rng)
        res = bundle_adjust(prob, iterations=15)
        assert float(res.final_cost) < 0.1 * float(res.initial_cost)
        # pose error vs ground truth
        for mi in range(2, 6):
            dT = np.asarray(res.T_cw)[mi] @ np.linalg.inv(T_gt[mi])
            ang = np.degrees(np.arccos(np.clip(
                (np.trace(dT[:3, :3]) - 1) / 2, -1, 1)))
            assert ang < 0.5, f"pose {mi} angle {ang}"
            assert np.linalg.norm(dT[:3, 3]) < 0.1

    def test_converges_to_pixel_noise_floor(self, rng):
        prob, _, _ = synth_ba_problem(rng, px_noise=0.5)
        res = bundle_adjust(prob, iterations=15)
        n_obs = int(prob.obs_mask.sum())
        # final cost ~ 0.5 * sum(r^2); per-obs residual ~ noise * sqrt(2)
        rms = np.sqrt(2 * float(res.final_cost) / n_obs / 2)
        assert rms < 1.0

    def test_robust_to_outliers(self, rng):
        prob, T_gt, _ = synth_ba_problem(rng, outlier_frac=0.1, px_noise=0.3)
        res = bundle_adjust(prob, iterations=20, huber_delta=2.0)
        for mi in range(2, 6):
            dT = np.asarray(res.T_cw)[mi] @ np.linalg.inv(T_gt[mi])
            assert np.linalg.norm(dT[:3, 3]) < 0.15

    def test_gauge_poses_untouched(self, rng):
        prob, _, _ = synth_ba_problem(rng)
        res = bundle_adjust(prob, iterations=5)
        np.testing.assert_array_equal(np.asarray(res.T_cw)[:2],
                                      np.asarray(prob.T_cw)[:2])

    def test_masked_obs_ignored(self, rng):
        """Poisoning masked-out observations must not change the result."""
        prob, _, _ = synth_ba_problem(rng)
        res1 = bundle_adjust(prob, iterations=5)
        poisoned = prob._replace(
            obs_uv=jnp.where(prob.obs_mask[..., None], prob.obs_uv, 1e6))
        res2 = bundle_adjust(poisoned, iterations=5)
        np.testing.assert_allclose(np.asarray(res1.T_cw),
                                   np.asarray(res2.T_cw), atol=1e-5)


class TestWindow:
    def test_extract_apply_roundtrip(self, rng):
        """Run the VO pipeline briefly, extract a window, verify shapes and
        that apply-after-extract with unchanged values is a no-op."""
        from ros2_mono_vo_tpu.config import VOConfig, FrontendConfig, TrackerConfig
        from ros2_mono_vo_tpu.io.synthetic import SyntheticScene
        from ros2_mono_vo_tpu.pipeline.vo import MonoVO
        scene = SyntheticScene(np.random.default_rng(5), image_shape=(240, 320))
        cfg = VOConfig(frontend=FrontendConfig(
            max_features=512, num_pyramid_levels=4, ransac_hypotheses=256,
            max_landmarks=4096, max_keyframes=16),
            tracker=TrackerConfig(min_observations_before_triangulation=60))
        vo = MonoVO(cfg, scene.K, scene.image_shape, seed=3)
        for i, T in enumerate(scene.camera_path(25)):
            vo.process_frame(scene.render(T), stamp=float(i))
        assert int(vo.map.kf_count) >= 3
        prob, info = extract_window(vo.map, vo.K, window=8, capacity=1024)
        n_obs = int(prob.obs_mask.sum())
        assert n_obs > 100
        m2 = apply_window(vo.map, prob.T_cw, prob.lm_xyz, info)
        valid_lm = np.asarray(info.lm_mask)
        np.testing.assert_allclose(
            np.asarray(m2.kf_pose_wc), np.asarray(vo.map.kf_pose_wc), atol=2e-5)
        lg = np.asarray(info.lm_global)[valid_lm]
        np.testing.assert_allclose(np.asarray(m2.lm_xyz)[lg],
                                   np.asarray(vo.map.lm_xyz)[lg], atol=1e-5)

    def test_ba_improves_map_reprojection(self, rng):
        from ros2_mono_vo_tpu.config import VOConfig, FrontendConfig, TrackerConfig
        from ros2_mono_vo_tpu.io.synthetic import SyntheticScene
        from ros2_mono_vo_tpu.pipeline.vo import MonoVO
        scene = SyntheticScene(np.random.default_rng(6), image_shape=(240, 320))
        cfg = VOConfig(frontend=FrontendConfig(
            max_features=512, num_pyramid_levels=4, ransac_hypotheses=256,
            max_landmarks=4096, max_keyframes=16),
            tracker=TrackerConfig(min_observations_before_triangulation=60))
        vo = MonoVO(cfg, scene.K, scene.image_shape, seed=4)
        for i, T in enumerate(scene.camera_path(30)):
            vo.process_frame(scene.render(T), stamp=float(i))
        prob, info = extract_window(vo.map, vo.K, window=8, capacity=1024)
        res = bundle_adjust(prob, iterations=10)
        assert float(res.final_cost) <= float(res.initial_cost)
        m2 = apply_window(vo.map, res.T_cw, res.lm_xyz, info)
        assert np.isfinite(np.asarray(m2.lm_xyz)).all()
