"""Loops LONGER than the keyframe ring: the persistent keyframe database
must still recognize, verify, and close them, and finalize's full-trajectory
pose graph must correct the whole emitted trajectory (VERDICT round-2 #6).

The ring here holds 6 keyframes; the loop produces ~3x that many before
revisiting the start, so the revisited keyframe has long fallen off the
ring and only the database can close the loop."""

import dataclasses

import numpy as np

from ros2_mono_vo_tpu.config import (VOConfig, FrontendConfig, TrackerConfig,
                                     BackendConfig)
from ros2_mono_vo_tpu.io.synthetic import SyntheticScene
from ros2_mono_vo_tpu.io.trajectory import ate_rmse, trajectory_positions
from ros2_mono_vo_tpu.pipeline.device_vo import DeviceMonoVO


def long_loop_config(enable_lc: bool) -> VOConfig:
    return VOConfig(
        frontend=FrontendConfig(max_features=512, num_pyramid_levels=4,
                                ransac_hypotheses=256, max_landmarks=4096,
                                max_keyframes=6, max_keyframe_log=64,
                                kdb_obs=128),
        tracker=TrackerConfig(min_observations_before_triangulation=60,
                              max_translation_from_keyframe=0.45),
        backend=BackendConfig(enable_loop_closure=enable_lc,
                              lc_min_gap=8, lc_sim_thresh=0.5,
                              lc_min_inliers=30, lc_min_inliers_far=30,
                              pgo_iterations=15))


def _run(cfg, scene, frames, n, chunk=12):
    vo = DeviceMonoVO(cfg, scene.K, scene.image_shape, seed=2, chunk=chunk)
    for i in range(0, n, chunk):
        vo.process_chunk(frames[i:i + chunk])
    vo.finalize()
    return vo


def _ate(vo, poses):
    est = trajectory_positions(vo.trajectory)
    stamps = [int(s) for s, _ in vo.trajectory]
    gt = np.stack([poses[i][:3, 3] for i in stamps])
    return ate_rmse(est, gt)


def test_loop_longer_than_ring_closes():
    scene = SyntheticScene(np.random.default_rng(5), image_shape=(240, 320))
    n = 96
    poses = scene.loop_path(n, radius=1.8, revisit_frames=10)
    frames = np.clip(np.stack(scene.render_sequence(poses)),
                     0, 255).astype(np.uint8)

    cfg = long_loop_config(True)
    vo = _run(cfg, scene, frames, n)

    # enough keyframes that the loop cannot live inside the 6-slot ring
    _, _, kfc = vo.keyframe_poses()
    assert kfc > cfg.frontend.max_keyframes + cfg.backend.lc_min_gap, \
        f"scenario too short: {kfc} keyframes"

    assert len(vo.loop_closures) >= 1, "no closure discovered"
    # at least one closure whose candidate had fallen OFF the ring
    beyond = [info for _, info in vo.loop_closures if not info["in_ring"]]
    assert beyond, ("closures found, but none beyond the ring: "
                    f"{[i['cand_index'] for _, i in vo.loop_closures]}")
    gap = beyond[0]["query_index"] - beyond[0]["cand_index"]
    assert gap > cfg.frontend.max_keyframes

    # full-trajectory pose graph runs and does not increase the cost
    ate_before = _ate(vo, poses)
    res = vo.optimize_full_trajectory()
    assert res is not None
    assert res["n_loop_edges"] >= 1
    assert res["cost1"] <= res["cost0"] + 1e-6
    ate_after = _ate(vo, poses)
    # the whole trajectory was re-emitted against optimized anchors and
    # stays consistent (PGO must not wreck it; usually it improves it)
    assert ate_after <= max(ate_before * 1.25, ate_before + 0.05), \
        f"full PGO degraded ATE {ate_before:.3f} -> {ate_after:.3f}"
