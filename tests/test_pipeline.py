"""End-to-end pipeline integration tests on synthetic scenes
(SURVEY.md section 4: init -> track -> keyframe, state transitions, ATE)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ros2_mono_vo_tpu.config import VOConfig, FrontendConfig, InitializerConfig, TrackerConfig
from ros2_mono_vo_tpu.io.synthetic import SyntheticScene
from ros2_mono_vo_tpu.io.trajectory import (
    ate_rmse, trajectory_positions, write_tum, write_kitti, read_kitti,
    umeyama_alignment,
)
from ros2_mono_vo_tpu.pipeline.vo import MonoVO
from ros2_mono_vo_tpu.pipeline.initializer import InitState
from ros2_mono_vo_tpu.pipeline.tracker import TrackerState


def small_config() -> VOConfig:
    return VOConfig(
        frontend=FrontendConfig(max_features=512, num_pyramid_levels=4,
                                ransac_hypotheses=256, max_landmarks=4096,
                                max_keyframes=16),
        tracker=TrackerConfig(min_observations_before_triangulation=60),
    )


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(3)
    return SyntheticScene(rng, image_shape=(240, 320))


class TestSynthetic:
    def test_renderer_reprojects_consistently(self, scene):
        img0 = scene.render(np.eye(4, dtype=np.float32))
        assert img0.shape == (240, 320)
        assert img0.std() > 20  # textured
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.5, 0, 0.5]
        img1 = scene.render(T)
        assert np.abs(img1 - img0).mean() > 1.0  # actually moved


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def run(self, scene):
        cfg = small_config()
        poses = scene.camera_path(40, step=0.12, lateral=0.03)
        frames = scene.render_sequence(poses)
        vo = MonoVO(cfg, scene.K, scene.image_shape, seed=1)
        infos = [vo.process_frame(f, stamp=float(i))
                 for i, f in enumerate(frames)]
        return vo, infos, poses

    def test_initializes(self, run):
        vo, infos, _ = run
        assert vo.initialized
        init_frame = next(i for i, inf in enumerate(infos)
                          if inf.get("init_state") == InitState.INITIALIZED)
        assert init_frame < 25

    def test_tracks_without_getting_lost(self, run):
        vo, infos, _ = run
        assert vo.tracker.state == TrackerState.TRACKING
        tracked = [i for i in infos if i.get("n_tracked")]
        assert len(tracked) > 10
        assert min(i["n_tracked"] for i in tracked) >= 10

    def test_keyframes_and_landmarks_grow(self, run):
        vo, infos, _ = run
        assert int(vo.map.kf_count) >= 2
        assert int(vo.map.lm_count) > 50
        lms = vo.landmarks()
        assert len(lms) == int(vo.map.lm_count)
        # landmarks should be in front of the initial camera, roughly in the
        # plane depth range (scale is arbitrary but init normalizes baseline
        # to 1, and the synthetic baseline is ~1 map unit per ~8 frames)
        assert np.isfinite(lms).all()

    def test_trajectory_ate(self, run):
        vo, infos, poses = run
        est = trajectory_positions(vo.trajectory)
        stamps = [int(s) for s, _ in vo.trajectory]
        gt = np.stack([poses[i][:3, 3] for i in stamps])
        assert len(est) > 15
        err = ate_rmse(est, gt, with_scale=True)
        # path length ~ 40 * 0.12 = 4.8 units; require ATE < 5% of length
        assert err < 0.25, f"ATE {err}"

    def test_pose_covariance_grows_when_lost(self, run, scene):
        vo, _, _ = run
        # simulate loss by feeding black frames
        cfg = small_config()
        vo2 = MonoVO(cfg, scene.K, scene.image_shape, seed=1)
        vo2.last_pose = np.eye(4, dtype=np.float32)
        vo2.tracking_valid = False
        vo2.last_valid_stamp = 0.0
        od = vo2.odometry(stamp=5.0)
        assert od["position_covariance"] == pytest.approx(
            MonoVO.BASE_POS_COV + 0.1 * 5.0)
        assert not od["tracking_valid"]


class TestTrajectoryIO:
    def test_tum_kitti_roundtrip(self, tmp_path, rng):
        from scipy.spatial.transform import Rotation
        traj = []
        for i in range(5):
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = Rotation.random(random_state=i).as_matrix()
            T[:3, 3] = rng.normal(size=3)
            traj.append((float(i), T))
        write_tum(str(tmp_path / "t.txt"), traj)
        write_kitti(str(tmp_path / "k.txt"), traj)
        back = read_kitti(str(tmp_path / "k.txt"))
        for (_, T), Tb in zip(traj, back):
            np.testing.assert_allclose(T, Tb, atol=1e-4)

    def test_umeyama_recovers_sim3(self, rng):
        from scipy.spatial.transform import Rotation
        src = rng.normal(size=(50, 3))
        R = Rotation.random(random_state=1).as_matrix()
        s, t = 2.5, np.array([1.0, -2.0, 0.5])
        dst = s * (R @ src.T).T + t
        s2, R2, t2 = umeyama_alignment(src, dst)
        assert s2 == pytest.approx(s, rel=1e-5)
        np.testing.assert_allclose(R2, R, atol=1e-6)
        assert ate_rmse(src, dst) < 1e-6
