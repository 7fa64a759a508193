"""Rate-decoupled odometry snapshot with covariance growth while lost.

Shared by every engine surface (host MonoVO, DeviceMonoVO,
BatchedDeviceMonoVO): reproduces the reference's publish_odom degradation
contract (reference mono_vo.cpp:167-198) — the last valid pose keeps being
reported, with position covariance growing at `growth_rate` per second since
the last valid estimate and rotation covariance at 0.1x that rate, on top of
the hardcoded base covariances (reference utils.cpp:129-140).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

# base covariances (reference utils.cpp:129-134 hardcodes 0.1 m^2 position,
# 0.05 rad^2 rotation)
BASE_POS_COV = 0.1
BASE_ROT_COV = 0.05
# position_covariance_growth_rate default (reference mono_vo.cpp:36-38)
DEFAULT_GROWTH_RATE = 0.1


def odometry_snapshot(last_pose: Optional[np.ndarray], tracking_valid: bool,
                      last_valid_stamp: Optional[float], stamp: float,
                      growth_rate: float = DEFAULT_GROWTH_RATE
                      ) -> Optional[dict]:
    """Odometry dict (pose + covariances + validity) or None before the
    first pose exists (the reference publishes nothing then,
    mono_vo.cpp:158-160)."""
    if last_pose is None:
        return None
    pos_cov = BASE_POS_COV
    rot_cov = BASE_ROT_COV
    if not tracking_valid and last_valid_stamp is not None:
        dt = max(stamp - last_valid_stamp, 0.0)
        growth = growth_rate * dt
        pos_cov += growth
        rot_cov += growth * 0.1
    return {"pose": last_pose, "position_covariance": pos_cov,
            "rotation_covariance": rot_cov, "tracking_valid": tracking_valid}
