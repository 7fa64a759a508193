"""Production bench configuration under test (VERDICT round-3 items #3/#4).

The round-3 bench failed ATE parity in exactly the configuration no test
exercised: `enable_local_ba=True` on the batched engine over a long
KITTI-proxy drive (chunk-cadence vmapped BA + capped keyframe service).
These tests run that regime — a reduced-resolution KittiProxyScene (CPU
affordable) over 100+ frames — and assert the property the bench needs:
every batched lane's Sim(3)-aligned ATE stays within a small factor of the
solo engine's on the same sequence.

Before the round-4 fixes (gauge anchoring from the first window, kdb
mirroring in apply_window, capped urgency keyframe service, and in-scan
serviced-lane BA replacing the chunk-cadence all-lane pass) the batched
worst lane measured 5-15x the solo ATE here; after, batched lanes sit
inside the solo seed distribution.
"""

import numpy as np
import pytest

from ros2_mono_vo_tpu.config import (VOConfig, FrontendConfig, TrackerConfig,
                                     BackendConfig)
from ros2_mono_vo_tpu.io.kitti_proxy import KittiProxyScene
from ros2_mono_vo_tpu.io.trajectory import ate_rmse, trajectory_positions
from ros2_mono_vo_tpu.pipeline.device_vo import (BatchedDeviceMonoVO,
                                                 DeviceMonoVO)

N_FRAMES = 104
CHUNK = 26


def prod_config(loop_closure: bool = False) -> VOConfig:
    """The bench's production config (bench.py _vo_config) at test scale."""
    return VOConfig(
        frontend=FrontendConfig(max_features=512, num_pyramid_levels=4,
                                ransac_hypotheses=256, max_landmarks=8192,
                                max_keyframes=32, max_track_points=256),
        tracker=TrackerConfig(min_observations_before_triangulation=60),
        backend=BackendConfig(enable_local_ba=True,
                              enable_loop_closure=loop_closure))


@pytest.fixture(scope="module")
def proxy_seq():
    rng = np.random.default_rng(5)
    scene = KittiProxyScene(rng, image_shape=(188, 620))
    poses = scene.camera_path(N_FRAMES, speed=0.5, curve=0.12, sway=0.04)
    frames = np.clip(np.stack([scene.render(T) for T in poses]),
                     0, 255).astype(np.uint8)
    return scene, poses, frames


def _ate(traj, poses):
    est = trajectory_positions(traj)
    stamps = [int(s) for s, _ in traj]
    gt = np.stack([poses[i][:3, 3] for i in stamps])
    return float(ate_rmse(est, gt))


@pytest.fixture(scope="module")
def solo_ba_ates(proxy_seq):
    """Solo-engine ATE at two of the batched run's lane seeds. The
    reduced-res proxy is intrinsically noisier than the full-res bench
    (fewer, coarser features): solo seeds measured 0.23-0.96 here, so the
    batched bound must compare against the matched-seed solo DISTRIBUTION,
    not one lucky seed."""
    scene, poses, frames = proxy_seq
    out = []
    for seed in (1, 1001):   # = lane seeds of BatchedDeviceMonoVO(seed=1)
        vo = DeviceMonoVO(prod_config(), scene.K, scene.image_shape,
                          seed=seed, chunk=CHUNK, sync=False)
        for i in range(0, N_FRAMES, CHUNK):
            vo.process_chunk(frames[i:i + CHUNK])
        vo.finalize()
        assert len(vo.trajectory) > N_FRAMES // 2
        out.append(_ate(vo.trajectory, poses))
    return out


def test_solo_local_ba_is_accurate(solo_ba_ates):
    # absolute sanity: the in-scan BA engine holds the proxy drive
    assert all(np.isfinite(a) for a in solo_ba_ates)
    assert max(solo_ba_ates) < 1.5, solo_ba_ates


def test_batched_lanes_match_solo_with_ba(proxy_seq, solo_ba_ates):
    """THE round-3 bench property: worst batched lane ~ solo, BA on.

    Regression net for the in-scan serviced-lane BA: the legacy
    chunk-cadence BA measured worst-lane 2.65 here (ba_every=10) and 2.03
    (ba_every=5) against this bound of ~1.7; in-scan measures 1.00, at the
    matched solo worst of 0.96."""
    scene, poses, frames = proxy_seq
    B = 4
    stack = np.broadcast_to(frames, (B,) + frames.shape)
    vo = BatchedDeviceMonoVO(prod_config(), scene.K, scene.image_shape,
                             batch=B, seed=1, chunk=CHUNK)
    for i in range(0, N_FRAMES, CHUNK):
        vo.process_chunk(stack[:, i:i + CHUNK])
    vo.finalize()
    ates = []
    for b in range(B):
        assert len(vo.trajectories[b]) > N_FRAMES // 2, f"lane {b} starved"
        ates.append(_ate(vo.trajectories[b], poses))
    worst = max(ates)
    ref = max(solo_ba_ates)
    bound = max(1.75 * ref, ref + 0.35)
    assert worst <= bound, (ates, solo_ba_ates)


def test_solo_with_loop_closure_runs_accurately(proxy_seq, solo_ba_ates):
    """BA + loop closure enabled together (the full production backend):
    engine must run the whole drive and stay near the BA-only accuracy
    (the proxy drive has no revisit, so closures should not fire and the
    attempt machinery must not disturb tracking)."""
    scene, poses, frames = proxy_seq
    vo = DeviceMonoVO(prod_config(loop_closure=True), scene.K,
                      scene.image_shape, seed=1, chunk=CHUNK, sync=False)
    for i in range(0, N_FRAMES, CHUNK):
        vo.process_chunk(frames[i:i + CHUNK])
    vo.finalize()
    assert len(vo.trajectory) > N_FRAMES // 2
    ate = _ate(vo.trajectory, poses)
    ref = max(solo_ba_ates)
    assert np.isfinite(ate)
    assert ate <= max(1.75 * ref, ref + 0.35), (ate, solo_ba_ates)
