"""TPU-native monocular visual odometry / SLAM engine.

A brand-new JAX/XLA/Pallas implementation of the capability surface of the
reference ROS2/OpenCV node `Tatsuya-2/ros2_mono_vo` (see SURVEY.md), plus its
roadmap backend (sliding-window bundle adjustment, pose graph) as distributed
TPU computation.

Design stance (SURVEY.md section 7): fixed-capacity tensors + validity masks
instead of std::vector; pure functions over a VO-state pytree instead of
stateful C++ classes; hypothesis-parallel RANSAC instead of sequential loops;
batched per-point kernels instead of per-point code.
"""

__version__ = "0.1.0"

import jax as _jax

# Pose/geometry math is tiny (3x3 / 4x4 matrices) but precision-critical:
# TPU's default matmul precision is bf16, which injects ~1e-3 error into
# rotations and triangulated points. Default to full f32 everywhere; the
# few throughput-bound matmuls (descriptor matching, BA blocks) opt back
# into fast paths explicitly with `precision=` / bf16 inputs.
_jax.config.update("jax_default_matmul_precision", "float32")

from ros2_mono_vo_tpu.config import (  # noqa: F401
    InitializerConfig,
    TrackerConfig,
    FrontendConfig,
    VOConfig,
)
