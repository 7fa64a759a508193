"""Landmark-slot recycling under capacity pressure.

The reference's maps are unbounded (`map.hpp:55-56`); our fixed-capacity
device map recycles slots whose landmarks fell off the keyframe ring
(state.recycle_landmarks + the free-slot allocator). These tests pin down
(a) the allocator/recycler mechanics and (b) that a long sequence with a
deliberately tiny landmark budget keeps tracking instead of silently
starving once the capacity fills (round-1 behavior: overflow ids -> -1).
"""

import jax.numpy as jnp
import numpy as np

from ros2_mono_vo_tpu.config import VOConfig, FrontendConfig, TrackerConfig
from ros2_mono_vo_tpu.io.synthetic import SyntheticScene
from ros2_mono_vo_tpu.io.trajectory import ate_rmse, trajectory_positions
from ros2_mono_vo_tpu.pipeline.state import (
    empty_map, add_keyframe, allocate_landmarks, recycle_landmarks,
    referenced_landmarks)


def tiny_cfg(L=32, Kmax=2, N=8):
    return FrontendConfig(max_features=N, descriptor_bits=8, max_landmarks=L,
                          max_keyframes=Kmax, num_pyramid_levels=2)


class TestAllocatorRecycler:
    def test_fresh_map_allocates_monotonically(self):
        fcfg = tiny_cfg()
        m = empty_map(fcfg)
        want = jnp.array([True, False, True, True, False, True, False, False])
        xyz = jnp.arange(24, dtype=jnp.float32).reshape(8, 3)
        desc = jnp.ones((8, 8), jnp.float32)
        m1, ids = allocate_landmarks(m, xyz, desc, want)
        np.testing.assert_array_equal(np.asarray(ids),
                                      [0, -1, 1, 2, -1, 3, -1, -1])
        assert int(m1.lm_count) == 4
        np.testing.assert_allclose(np.asarray(m1.lm_xyz[1]),
                                   np.asarray(xyz[2]))

    def test_overflow_drops_then_recycle_frees(self):
        fcfg = tiny_cfg(L=8, Kmax=2, N=8)
        m = empty_map(fcfg)
        xyz = jnp.zeros((8, 3), jnp.float32)
        desc = jnp.ones((8, 8), jnp.float32)
        m, ids0 = allocate_landmarks(m, xyz, desc, jnp.ones(8, bool))
        assert int(m.lm_count) == 8
        # full: further allocation drops everything
        m2, ids1 = allocate_landmarks(m, xyz, desc, jnp.ones(8, bool))
        assert (np.asarray(ids1) == -1).all()

        # keyframe 0 references landmarks 0..3, keyframe 1 references 4..5
        uv = jnp.zeros((8, 2), jnp.float32)
        kd = jnp.zeros((8, 8), jnp.float32)
        m = add_keyframe(m, jnp.eye(4),
                         uv, jnp.array([0, 1, 2, 3, -1, -1, -1, -1]),
                         jnp.ones(8, bool), kd)
        m = add_keyframe(m, jnp.eye(4),
                         uv, jnp.array([4, 5, -1, -1, -1, -1, -1, -1]),
                         jnp.ones(8, bool), kd)
        ref = np.asarray(referenced_landmarks(
            m, protect_ids=jnp.array([6, -1])))
        np.testing.assert_array_equal(
            ref, [1, 1, 1, 1, 1, 1, 1, 0])  # 6 protected, 7 unreferenced

        m = recycle_landmarks(m, protect_ids=jnp.array([6, -1]))
        assert int(m.lm_count) == 7
        assert not bool(m.lm_valid[7])
        # freed slot 7 is handed out again
        m3, ids2 = allocate_landmarks(
            m, xyz, desc, jnp.array([True] + [False] * 7))
        np.testing.assert_array_equal(np.asarray(ids2),
                                      [7, -1, -1, -1, -1, -1, -1, -1])

    def test_ring_wrap_frees_evicted_keyframes_landmarks(self):
        fcfg = tiny_cfg(L=16, Kmax=2, N=4)
        m = empty_map(fcfg)
        uv = jnp.zeros((4, 2), jnp.float32)
        kd = jnp.zeros((4, 8), jnp.float32)
        # 3 keyframes into a 2-slot ring: KF0's (0..3) get evicted
        for base in (0, 4, 8):
            ids = jnp.arange(base, base + 4, dtype=jnp.int32)
            m, _ = allocate_landmarks(
                m, jnp.zeros((4, 3)), jnp.ones((4, 8)), jnp.ones(4, bool))
            m = add_keyframe(m, jnp.eye(4), uv, ids, jnp.ones(4, bool), kd)
        m = recycle_landmarks(m)
        valid = np.asarray(m.lm_valid)
        assert not valid[:4].any()      # KF0's landmarks freed
        assert valid[4:12].all()        # ring KFs' landmarks kept


class TestLongSequenceCapacityPressure:
    def test_tracking_survives_tiny_landmark_budget(self):
        """120 frames, max_landmarks=1024, a 4-deep keyframe ring, and a
        keyframe every <=4 frames: ~20 keyframes each allocating fresh
        landmarks drive cumulative allocations far past the 1024 cap.
        Round-1 behavior (monotonic ids, overflow -> -1) starves the
        tracked bank once the cap fills and the engine goes LOST; with
        ring-eviction recycling it must stay TRACKING with bounded ATE."""
        from ros2_mono_vo_tpu.pipeline.device_vo import (
            DeviceMonoVO, MODE_TRACKING)

        L = 1024
        cfg = VOConfig(
            frontend=FrontendConfig(max_features=512, num_pyramid_levels=4,
                                    ransac_hypotheses=256, max_landmarks=L,
                                    max_keyframes=4, max_track_points=256),
            tracker=TrackerConfig(min_observations_before_triangulation=60,
                                  max_tracking_after_keyframe=4))
        scene = SyntheticScene(np.random.default_rng(11),
                               image_shape=(240, 320),
                               depths=(10.0, 18.0, 32.0),
                               extents=(9.0, 17.0, 36.0))
        poses = scene.camera_path(120, step=0.05, lateral=0.015)
        frames = np.stack([scene.render(T) for T in poses])

        vo = DeviceMonoVO(cfg, scene.K, scene.image_shape, seed=2, chunk=30)
        modes, kf_added, lm_counts = [], [], []
        for i in range(0, 120, 30):
            outs = vo.process_chunk(frames[i:i + 30])
            modes.append(np.asarray(outs.mode))
            kf_added.append(np.asarray(outs.kf_added))
            lm_counts.append(int(vo.carry.map.lm_count))
        modes = np.concatenate(modes)
        kf_added = np.concatenate(kf_added)

        assert modes[-1] == MODE_TRACKING, f"lost at end (mode {modes[-1]})"
        # the ring wrapped many times over — recycling territory
        assert int(vo.carry.map.kf_count) >= 12
        # keyframes keep landing deep into the run (capacity pressure zone)
        assert kf_added[60:].sum() >= 3, kf_added.sum()
        # within budget throughout, and full-ish rather than starved
        assert all(c <= L for c in lm_counts), lm_counts
        assert lm_counts[-1] > 300, lm_counts

        est = trajectory_positions(vo.trajectory)
        stamps = [int(s) for s, _ in vo.trajectory]
        gt = np.stack([poses[i][:3, 3] for i in stamps])
        assert ate_rmse(est, gt) < 1.0
