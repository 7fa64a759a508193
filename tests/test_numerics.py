"""Numeric sanity: live engine state stays finite through a run (SURVEY
section 5 sanitizer analog), and the kernel-level nan_guard works."""

import numpy as np
import pytest

from ros2_mono_vo_tpu.config import VOConfig, FrontendConfig, TrackerConfig
from ros2_mono_vo_tpu.io.synthetic import SyntheticScene
from ros2_mono_vo_tpu.pipeline.device_vo import DeviceMonoVO
from ros2_mono_vo_tpu.utils.debug import (check_finite_state, nan_guard,
                                          StateCorruption)


def small_cfg():
    return VOConfig(
        frontend=FrontendConfig(max_features=512, num_pyramid_levels=4,
                                ransac_hypotheses=256, max_landmarks=4096,
                                max_keyframes=8, max_keyframe_log=32),
        tracker=TrackerConfig(min_observations_before_triangulation=60))


def test_live_state_finite_through_run():
    scene = SyntheticScene(np.random.default_rng(7), image_shape=(240, 320))
    poses = scene.camera_path(24, step=0.1)
    frames = np.clip(np.stack(scene.render_sequence(poses)),
                     0, 255).astype(np.uint8)
    vo = DeviceMonoVO(small_cfg(), scene.K, scene.image_shape, seed=3,
                      chunk=12)
    for i in range(0, 24, 12):
        vo.process_chunk(frames[i:i + 12])
        check_finite_state(vo.carry, where=f"after chunk {i}")
    assert len(vo.trajectory) > 5
    assert all(np.isfinite(T).all() for _, T in vo.trajectory)


def test_check_catches_corruption():
    scene = SyntheticScene(np.random.default_rng(7), image_shape=(240, 320))
    vo = DeviceMonoVO(small_cfg(), scene.K, scene.image_shape, seed=3)
    import jax.numpy as jnp
    bad = vo.carry._replace(pose_wc=jnp.full((4, 4), jnp.nan))
    with pytest.raises(StateCorruption):
        check_finite_state(bad)


def test_nan_guard_kernel_level():
    import jax
    import jax.numpy as jnp
    with nan_guard():
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.float32(-1.0)).block_until_ready()
    # guard restored
    assert not jax.config.jax_debug_nans
