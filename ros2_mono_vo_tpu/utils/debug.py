"""Numeric-sanity harness (SURVEY section 5 "race detection / sanitizers"):
JAX's functional model removes data races, so the remaining failure class is
numeric — NaN/Inf leaking into live state through a masked-lane guard that
stopped masking. These checks make that observable.

`check_finite_state` validates every LIVE part of a VOCarry (invalid slots
are allowed to hold garbage by design — fixed-capacity masked arrays).
`nan_guard` is a context manager enabling jax_debug_nans for targeted
blocks (it is too strict for the full engine: masked lanes legitimately
produce NaNs that get selected away).
"""

from __future__ import annotations

import contextlib

import numpy as np


class StateCorruption(AssertionError):
    pass


def check_finite_state(carry, where: str = "") -> None:
    """Raise StateCorruption if any LIVE state in the carry is non-finite.

    Live state = current pose, valid landmarks, valid keyframe poses, valid
    tracked observations, valid db entries.
    """
    m = carry.map

    def req(ok: bool, what: str):
        if not ok:
            raise StateCorruption(f"non-finite {what} {where}")

    pose = np.asarray(carry.pose_wc)
    req(np.isfinite(pose).all(), "pose_wc")

    lmv = np.asarray(m.lm_valid)
    req(np.isfinite(np.asarray(m.lm_xyz)[lmv]).all(), "lm_xyz[valid]")

    kfv = np.asarray(m.kf_valid)
    req(np.isfinite(np.asarray(m.kf_pose_wc)[kfv]).all(), "kf_pose_wc[valid]")

    obs = carry.prev_obs
    ov = np.asarray(obs.valid)
    req(np.isfinite(np.asarray(obs.uv)[ov]).all(), "prev_obs.uv[valid]")

    dbv = np.asarray(m.kdb_valid)
    req(np.isfinite(np.asarray(m.kdb_pose_wc)[dbv]).all(),
        "kdb_pose_wc[valid]")
    req(np.isfinite(np.asarray(m.kdb_xyz)[dbv]).all(), "kdb_xyz[valid]")


@contextlib.contextmanager
def nan_guard():
    """Enable jax_debug_nans for a targeted block (kernel-level checks)."""
    import jax
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
