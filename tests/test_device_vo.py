"""On-device fused VO scan vs the host-driven pipeline."""

import jax
import numpy as np
import pytest

from ros2_mono_vo_tpu.config import VOConfig, FrontendConfig, TrackerConfig
from ros2_mono_vo_tpu.io.synthetic import SyntheticScene
from ros2_mono_vo_tpu.io.trajectory import ate_rmse, trajectory_positions
from ros2_mono_vo_tpu.pipeline.device_vo import (
    DeviceMonoVO, MODE_TRACKING, MODE_LOST)
from ros2_mono_vo_tpu.pipeline.vo import MonoVO


def small_config() -> VOConfig:
    return VOConfig(
        frontend=FrontendConfig(max_features=512, num_pyramid_levels=4,
                                ransac_hypotheses=256, max_landmarks=4096,
                                max_keyframes=16),
        tracker=TrackerConfig(min_observations_before_triangulation=60))


@pytest.fixture(scope="module")
def scene():
    return SyntheticScene(np.random.default_rng(3), image_shape=(240, 320))


@pytest.fixture(scope="module")
def sequence(scene):
    poses = scene.camera_path(40, step=0.12, lateral=0.03)
    frames = np.stack(scene.render_sequence(poses))
    return poses, frames


class TestDeviceVO:
    def test_tracks_and_matches_host_ate(self, scene, sequence):
        poses, frames = sequence
        cfg = small_config()
        dvo = DeviceMonoVO(cfg, scene.K, scene.image_shape, seed=1, chunk=20)
        outs1 = dvo.process_chunk(frames[:20])
        outs2 = dvo.process_chunk(frames[20:])
        modes = np.concatenate([outs1.mode, outs2.mode])
        assert (modes == MODE_TRACKING).sum() > 20
        assert not (modes == MODE_LOST).any()

        est = trajectory_positions(dvo.trajectory)
        stamps = [int(s) for s, _ in dvo.trajectory]
        gt = np.stack([poses[i][:3, 3] for i in stamps])
        ate_dev = ate_rmse(est, gt)
        assert ate_dev < 0.5, f"device ATE {ate_dev}"

        # host pipeline on the same frames: same ballpark accuracy
        hvo = MonoVO(cfg, scene.K, scene.image_shape, seed=1)
        for i, f in enumerate(frames):
            hvo.process_frame(f, stamp=float(i))
        est_h = trajectory_positions(hvo.trajectory)
        stamps_h = [int(s) for s, _ in hvo.trajectory]
        gt_h = np.stack([poses[i][:3, 3] for i in stamps_h])
        ate_host = ate_rmse(est_h, gt_h)
        assert abs(ate_dev - ate_host) < 0.25, (ate_dev, ate_host)

    def test_blackout_goes_lost_and_sticky(self, scene, sequence):
        poses, frames = sequence
        cfg = small_config()
        dvo = DeviceMonoVO(cfg, scene.K, scene.image_shape, seed=1)
        dvo.process_chunk(frames[:20])
        black = np.zeros((3,) + scene.image_shape, np.float32)
        outs = dvo.process_chunk(black)
        assert (np.asarray(outs.mode) == MODE_LOST).any()
        # good frames afterwards stay LOST (sticky)
        outs2 = dvo.process_chunk(frames[20:25])
        assert (np.asarray(outs2.mode) == MODE_LOST).all()
        assert not np.asarray(outs2.valid).any()

    def test_chunk_boundaries_dont_matter(self, scene, sequence):
        poses, frames = sequence
        cfg = small_config()
        a = DeviceMonoVO(cfg, scene.K, scene.image_shape, seed=5, chunk=40)
        a.process_chunk(frames)
        b = DeviceMonoVO(cfg, scene.K, scene.image_shape, seed=5, chunk=7)
        for i in range(0, 40, 7):
            b.process_chunk(frames[i:i + 7])
        pa = trajectory_positions(a.trajectory)
        pb = trajectory_positions(b.trajectory)
        assert len(pa) == len(pb)
        np.testing.assert_allclose(pa, pb, atol=1e-3)
