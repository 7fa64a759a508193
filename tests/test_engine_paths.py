"""Engine input-path parity: put_chunk/process_staged/_process_device vs the
plain host process_chunk path, plus a store_descriptors=False smoke run.

These device-staged paths are the bench's production input pipeline
(ADVICE round-4 #1: they previously had no unit coverage, so a regression
would silently corrupt headline results). All paths must produce
IDENTICAL trajectories — they feed the same jitted scans, only the staging
differs.
"""

import numpy as np
import pytest

from ros2_mono_vo_tpu.config import (VOConfig, FrontendConfig, TrackerConfig,
                                     BackendConfig)
from ros2_mono_vo_tpu.pipeline.device_vo import (DeviceMonoVO,
                                                 BatchedDeviceMonoVO)


N_FRAMES = 60
CHUNK = 20


def _cfg(store_descriptors=True):
    return VOConfig(
        frontend=FrontendConfig(max_features=1024, num_pyramid_levels=4,
                                ransac_hypotheses=256, max_landmarks=4096,
                                max_keyframes=16,
                                store_descriptors=store_descriptors),
        tracker=TrackerConfig(),
        backend=BackendConfig(enable_local_ba=True))


@pytest.fixture(scope="module")
def seq():
    from tools.diag_batched_parity import cached_sequence
    scene, poses, stack = cached_sequence(N_FRAMES)
    return scene, poses, stack


def _traj(vo):
    return [(s, np.asarray(T)) for s, T in vo.trajectory]


def test_process_staged_matches_host_chunks(seq):
    scene, poses, stack = seq
    cfg = _cfg()

    vo_host = DeviceMonoVO(cfg, scene.K, scene.image_shape, seed=3,
                           chunk=CHUNK, sync=False)
    for i in range(0, N_FRAMES, CHUNK):
        vo_host.process_chunk(stack[i:i + CHUNK])
    vo_host.finalize()

    vo_dev = DeviceMonoVO(cfg, scene.K, scene.image_shape, seed=3,
                          chunk=CHUNK, sync=False)
    staged = [vo_dev.put_chunk(stack[i:i + CHUNK])
              for i in range(0, N_FRAMES, CHUNK)]
    for fdev, m in staged:
        vo_dev.process_staged(fdev, m)
    vo_dev.finalize()

    th, td = _traj(vo_host), _traj(vo_dev)
    assert len(th) == len(td) and len(th) > 20
    for (sh, Th), (sd, Td) in zip(th, td):
        assert sh == sd
        np.testing.assert_array_equal(Th, Td)


def test_batched_device_chunks_match_host_chunks(seq):
    scene, poses, stack = seq
    cfg = _cfg()
    B = 2
    stack_b = np.broadcast_to(stack, (B,) + stack.shape)

    vo_host = BatchedDeviceMonoVO(cfg, scene.K, scene.image_shape, batch=B,
                                  seed=5, chunk=CHUNK)
    for i in range(0, N_FRAMES, CHUNK):
        vo_host.process_chunk(stack_b[:, i:i + CHUNK])
    vo_host.finalize()

    vo_dev = BatchedDeviceMonoVO(cfg, scene.K, scene.image_shape, batch=B,
                                 seed=5, chunk=CHUNK)
    staged = [vo_dev.put_chunk(stack_b[:, i:i + CHUNK])
              for i in range(0, N_FRAMES, CHUNK)]
    for fdev, m in staged:
        vo_dev.process_chunk(fdev, n_real=m)
    vo_dev.finalize()

    for b in range(B):
        th = [(s, np.asarray(T)) for s, T in vo_host.trajectories[b]]
        td = [(s, np.asarray(T)) for s, T in vo_dev.trajectories[b]]
        assert len(th) == len(td) and len(th) > 20
        for (sh, Th), (sd, Td) in zip(th, td):
            assert sh == sd
            np.testing.assert_array_equal(Th, Td)


def test_store_descriptors_off_smoke(seq):
    scene, poses, stack = seq
    cfg = _cfg(store_descriptors=False)
    vo = DeviceMonoVO(cfg, scene.K, scene.image_shape, seed=3, chunk=CHUNK,
                      sync=False)
    for i in range(0, N_FRAMES, CHUNK):
        vo.process_chunk(stack[i:i + CHUNK])
    vo.finalize()
    assert len(vo.trajectory) > 20
    from bench import _traj_ate
    ate = _traj_ate(vo.trajectory, poses)
    assert np.isfinite(ate) and ate < 3.0
