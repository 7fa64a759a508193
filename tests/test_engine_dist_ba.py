"""Engine-mode distributed BA (VERDICT round-3 #6): the LIVE engine's
sliding window solved landmark-sharded over the 8-device CPU mesh must
leave the same refined map as the single-device solve."""

import copy

import jax
import numpy as np
import pytest

from ros2_mono_vo_tpu.config import VOConfig, FrontendConfig, TrackerConfig
from ros2_mono_vo_tpu.io.synthetic import SyntheticScene
from ros2_mono_vo_tpu.parallel.mesh import make_mesh, make_pod_mesh, LM_AXIS
from ros2_mono_vo_tpu.pipeline.device_vo import DeviceMonoVO


@pytest.fixture(scope="module")
def tracked_engine():
    scene = SyntheticScene(np.random.default_rng(3), image_shape=(240, 320))
    poses = scene.camera_path(36, step=0.1, lateral=0.02)
    frames = np.clip(np.stack([scene.render(T) for T in poses]),
                     0, 255).astype(np.uint8)
    cfg = VOConfig(
        frontend=FrontendConfig(max_features=512, num_pyramid_levels=4,
                                ransac_hypotheses=256, max_landmarks=4096,
                                max_keyframes=8, max_keyframe_log=32),
        tracker=TrackerConfig(min_observations_before_triangulation=60))
    vo = DeviceMonoVO(cfg, scene.K, scene.image_shape, seed=2, chunk=12)
    for i in range(0, len(frames), 12):
        vo.process_chunk(frames[i:i + 12])
    vo.finalize()
    _, _, kfc = vo.keyframe_poses()
    assert kfc >= 4, f"engine produced only {kfc} keyframes"
    return vo


def _ba_and_snapshot(vo, mesh):
    vo = copy.copy(vo)
    vo.carry = jax.tree.map(lambda x: x, vo.carry)   # decouple the pytree
    if mesh is not None:
        # the distributed path must be fully device-resident (VERDICT
        # round-4 #7): window extraction, shard partitioning, sharded LM,
        # scatter-back — any implicit HOST transfer fails here
        # (device-to-device resharding single-chip carry -> mesh
        # replication is expected: an ICI broadcast on real hardware)
        with jax.transfer_guard_host_to_device("disallow"), \
                jax.transfer_guard_device_to_host("disallow"):
            vo.run_local_ba(iterations=4, mesh=mesh)
        # the static per-shard block width must not have dropped any
        # observation on this window (fetch happens OUTSIDE the guard)
        assert int(np.asarray(vo.last_ba_obs_dropped)) == 0
    else:
        vo.run_local_ba(iterations=4, mesh=mesh)
    m = vo.carry.map
    return (np.asarray(m.kf_pose_wc), np.asarray(m.lm_xyz),
            np.asarray(m.lm_valid))


@pytest.mark.parametrize("mesh_kind", ["lm8", "pod2x4"])
def test_sharded_engine_ba_matches_single_device(tracked_engine, mesh_kind):
    if mesh_kind == "lm8":
        mesh = make_mesh(8, axis=LM_AXIS)
    else:
        # single-process stand-in for the 2-host pod layout: same 2-D
        # ("dcn", "lm") axes and hierarchical psum as make_pod_mesh builds
        # across real hosts
        from jax.sharding import Mesh
        mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                    ("dcn", LM_AXIS))
    pose_1, lm_1, ok_1 = _ba_and_snapshot(tracked_engine, mesh=None)
    pose_n, lm_n, ok_n = _ba_and_snapshot(tracked_engine, mesh=mesh)
    np.testing.assert_array_equal(ok_1, ok_n)
    np.testing.assert_allclose(pose_n, pose_1, atol=2e-3)
    # landmarks sit tens of units out — allow reduction-order noise (the
    # shard psum sums partial normal equations in a different order than the
    # single-device reduction; a weakly-observed landmark can move ~1e-2
    # relative while every pose stays within 2e-3 absolute)
    np.testing.assert_allclose(lm_n[ok_1], lm_1[ok_1], rtol=2e-2, atol=5e-3)
