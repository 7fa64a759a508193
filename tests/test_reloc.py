"""Relocalization-from-LOST (beyond-reference capability; SURVEY.md section 5
failure-detection: 'same lost/covariance semantics, plus relocalization
hooks'). The reference's LOST is terminal (tracker.cpp:277-279)."""

import dataclasses

import numpy as np

from ros2_mono_vo_tpu.config import VOConfig, FrontendConfig, TrackerConfig
from ros2_mono_vo_tpu.io.synthetic import SyntheticScene
from ros2_mono_vo_tpu.pipeline.vo import MonoVO
from ros2_mono_vo_tpu.pipeline.tracker import TrackerState


def _cfg(reloc: bool) -> VOConfig:
    return VOConfig(
        frontend=FrontendConfig(max_features=512, num_pyramid_levels=4,
                                ransac_hypotheses=256, max_landmarks=4096,
                                max_keyframes=16),
        tracker=TrackerConfig(min_observations_before_triangulation=60,
                              enable_relocalization=reloc,
                              reloc_min_inliers=20),
    )


def _run_until_tracking(vo, scene, poses):
    frames = scene.render_sequence(poses)
    for i, f in enumerate(frames):
        vo.process_frame(f, stamp=float(i))
    return frames


def test_relocalizes_after_blackout():
    rng = np.random.default_rng(7)
    scene = SyntheticScene(rng, image_shape=(240, 320))
    poses = scene.camera_path(18, step=0.12, lateral=0.03)

    vo = MonoVO(_cfg(reloc=True), scene.K, scene.image_shape, seed=1)
    _run_until_tracking(vo, scene, poses)
    assert vo.initialized and not vo.lost
    n_before = len(vo.trajectory)

    # blackout frames kill LK tracking -> LOST
    black = np.zeros(scene.image_shape, np.float32)
    for j in range(2):
        vo.process_frame(black, stamp=100.0 + j)
    assert vo.lost

    # revisit a previously-seen viewpoint -> should relocalize
    revisit = scene.render(poses[12])
    info = vo.process_frame(revisit, stamp=200.0)
    assert info.get("relocalized"), f"no reloc: {info}"
    assert vo.tracker.state == TrackerState.TRACKING
    assert len(vo.trajectory) == n_before + 1

    # recovered pose should be near the ground-truth revisit pose
    # (synthetic scale is metric here because init scale ~ recoverPose unit
    # baseline; allow loose tolerance + compare direction of motion instead
    # of absolute position if scale drifts)
    est = vo.trajectory[-1][1][:3, 3]
    gt = poses[12][:3, 3]
    scale = np.linalg.norm(vo.trajectory[n_before - 1][1][:3, 3]) / \
        max(np.linalg.norm(poses[17][:3, 3]), 1e-9)
    assert np.linalg.norm(est - gt * scale) < 0.5 * max(scale, 1.0)

    # tracking continues after relocalization
    nxt = scene.render(poses[13])
    info2 = vo.process_frame(nxt, stamp=201.0)
    assert vo.tracker.state == TrackerState.TRACKING
    assert info2["pose"] is not None


def test_lost_stays_terminal_without_reloc():
    rng = np.random.default_rng(7)
    scene = SyntheticScene(rng, image_shape=(240, 320))
    poses = scene.camera_path(18, step=0.12, lateral=0.03)

    vo = MonoVO(_cfg(reloc=False), scene.K, scene.image_shape, seed=1)
    _run_until_tracking(vo, scene, poses)
    black = np.zeros(scene.image_shape, np.float32)
    for j in range(2):
        vo.process_frame(black, stamp=100.0 + j)
    assert vo.lost
    # reference parity: LOST is sticky even when the scene comes back
    info = vo.process_frame(scene.render(poses[12]), stamp=200.0)
    assert vo.lost and info["pose"] is None or not info.get("tracking_valid", True)
