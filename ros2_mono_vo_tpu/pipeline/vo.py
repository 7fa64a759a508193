"""Top-level monocular VO engine.

Replaces the reference's L5 node shell (`mono_vo.cpp:83-213`): dispatches each
frame to init-or-track, keeps the last-pose / tracking-valid bookkeeping
(including the sticky-LOST, covariance-growth degradation of
`mono_vo.cpp:119-130,167-198`), and accumulates the trajectory. Topic pub/sub
has no TPU analog — outputs are returned/exported instead (SURVEY.md section
7, stage 6).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ros2_mono_vo_tpu.config import VOConfig
from ros2_mono_vo_tpu.ops.features import detect_and_describe
from ros2_mono_vo_tpu.ops.lk import build_lk_pyramid
from ros2_mono_vo_tpu.pipeline.state import empty_map, FrameObs
from ros2_mono_vo_tpu.pipeline.initializer import Initializer, InitState
from ros2_mono_vo_tpu.pipeline.tracker import Tracker, TrackerState


class MonoVO:
    """Host driver owning the functional map state + the two state machines.

    Per-frame flow mirrors image_callback (mono_vo.cpp:83-153); odometry
    covariance semantics mirror publish_odom (mono_vo.cpp:167-198).
    """

    # base covariances (reference utils.cpp:129-134 hardcodes 0.1 / 0.05)
    BASE_POS_COV = 0.1
    BASE_ROT_COV = 0.05

    def __init__(self, cfg: VOConfig, K: np.ndarray,
                 image_shape: tuple[int, int], seed: int = 0, d=None):
        self.cfg = cfg
        self.K = jnp.asarray(K, jnp.float32)
        # distortion coefficients latched like the reference's d_
        # (mono_vo.cpp:204-207), consumed only by PnP (tracker.cpp:309)
        self.d = d
        self.image_shape = image_shape
        self.map = empty_map(cfg.frontend)
        self.initializer = Initializer(cfg.initializer, cfg.frontend, image_shape)
        self.tracker = Tracker(cfg.tracker, cfg.frontend, d=d)
        self._key = jax.random.PRNGKey(seed)
        # pose bookkeeping (mono_vo.hpp:64-71 under pose_mutex_; functional here)
        self.last_pose: Optional[np.ndarray] = None
        self.tracking_valid = False
        self.last_valid_stamp: Optional[float] = None
        self.trajectory: list[tuple[float, np.ndarray]] = []
        self.frame_index = 0

    def _next_key(self) -> jax.Array:
        self._key, k = jax.random.split(self._key)
        return k

    @property
    def initialized(self) -> bool:
        return self.initializer.state == InitState.INITIALIZED

    @property
    def lost(self) -> bool:
        return self.tracker.state == TrackerState.LOST

    def process_frame(self, image: np.ndarray, stamp: float | None = None) -> dict:
        """Feed one grayscale frame ([H, W], 0..255). Returns an info dict
        with 'pose' (T_wc, CV axes) when tracking is valid."""
        if stamp is None:
            stamp = float(self.frame_index)
        self.frame_index += 1
        img = jnp.asarray(image, jnp.float32)
        info: dict = {"stamp": stamp}

        if not self.initialized:
            feats = detect_and_describe(img, self.cfg.frontend)
            self.map, cur_lm_id = self.initializer.try_initializing(
                feats, self.K, self.map, self._next_key())
            info["init_state"] = self.initializer.state
            if cur_lm_id is not None:
                pyr = build_lk_pyramid(img, self.cfg.frontend.lk_levels)
                self.tracker.seed(pyr, FrameObs(uv=feats.uv, lm_id=cur_lm_id,
                                                valid=feats.valid))
                # reference sets the initial published pose to identity
                # (mono_vo.cpp:108-112)
                self.last_pose = np.eye(4, dtype=np.float32)
                self.tracking_valid = True
                self.last_valid_stamp = stamp
                self.trajectory.append((stamp, self.last_pose.copy()))
            info["pose"] = self.last_pose if self.tracking_valid else None
            return info

        self.map, pose, tinfo = self.tracker.update(
            img, self.map, self.K, self._next_key())
        info.update(tinfo)
        if self.tracker.state == TrackerState.LOST:
            # keep last pose, flag invalid (mono_vo.cpp:121-124)
            self.tracking_valid = False
        elif pose is not None:
            self.last_pose = np.asarray(pose)
            self.tracking_valid = True
            self.last_valid_stamp = stamp
            self.trajectory.append((stamp, self.last_pose.copy()))
        info["pose"] = self.last_pose if self.tracking_valid else None
        info["tracking_valid"] = self.tracking_valid
        return info

    def odometry(self, stamp: float) -> Optional[dict]:
        """Odometry snapshot with covariance growth while lost
        (publish_odom, mono_vo.cpp:167-198)."""
        if self.last_pose is None:
            return None
        pos_cov = self.BASE_POS_COV
        rot_cov = self.BASE_ROT_COV
        if not self.tracking_valid and self.last_valid_stamp is not None:
            dt = max(stamp - self.last_valid_stamp, 0.0)
            growth = self.cfg.node.position_covariance_growth_rate * dt
            pos_cov += growth
            rot_cov += growth * 0.1
        return {"pose": self.last_pose, "position_covariance": pos_cov,
                "rotation_covariance": rot_cov,
                "tracking_valid": self.tracking_valid}

    def landmarks(self) -> np.ndarray:
        """Current map pointcloud (CV axes), valid landmarks only."""
        xyz = np.asarray(self.map.lm_xyz)
        valid = np.asarray(self.map.lm_valid)
        return xyz[valid]
