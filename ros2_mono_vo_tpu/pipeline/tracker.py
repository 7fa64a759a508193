"""Frame-to-frame tracking: INITIALIZING -> TRACKING -> LOST.

TPU-native re-design of the reference Tracker (`tracker.cpp:274-333`, state
machine at `tracker.hpp:20-25`): two jitted device steps — the per-frame hot
path (LK flow + PnP RANSAC + keyframe decision, `tracker.cpp:58-136,289-319`)
and the keyframe step (parallax gate + ORB re-detect + match-to-last-keyframe
+ triangulation + landmark allocation, `tracker.cpp:182-268`) — driven by a
host state machine that reads only scalar flags.

Deliberate behavior matches (SURVEY.md quirks preserved):
  - `should_add_keyframe` fires when tracked observations drop BELOW
    min_observations_before_triangulation (tracker.cpp:120-123);
  - PnP uses its own hardcoded 8.0 px / 100-iteration settings, not
    tracker.ransac_reproj_thresh (tracker.cpp:309);
  - LOST is terminal (tracker.cpp:277-279);
  - when a last-keyframe match already has a landmark its id is reused and
    the fresh triangulation is discarded (tracker.cpp:219-222).
Fixed by design: has_parallax correspondence misalignment
(tracker.cpp:239-240) — our lookup is by landmark id, never positional.
"""

from __future__ import annotations

import enum
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ros2_mono_vo_tpu.config import TrackerConfig, FrontendConfig
from ros2_mono_vo_tpu.geometry.distortion import undistort_pixels
from ros2_mono_vo_tpu.geometry.se3 import se3_inverse, rotation_angle
from ros2_mono_vo_tpu.geometry.triangulation import (
    triangulate_and_filter, triangulation_quality_mask)
from ros2_mono_vo_tpu.ops.features import Features, detect_and_describe
from ros2_mono_vo_tpu.ops.lk import lk_track, build_lk_pyramid
from ros2_mono_vo_tpu.ops.matching import match_descriptors
from ros2_mono_vo_tpu.ops.ransac import solve_pnp_ransac
from ros2_mono_vo_tpu.pipeline.initializer import check_parallax
from ros2_mono_vo_tpu.pipeline.state import (
    MapState, FrameObs, add_keyframe, allocate_landmarks, compact_obs,
    landmark_uv_lookup, last_kf_slot, recycle_landmarks,
)


class TrackerState(enum.IntEnum):
    INITIALIZING = 0
    TRACKING = 1
    LOST = 2


class TrackStepResult(NamedTuple):
    obs: FrameObs             # tracked observations (landmark ids carried)
    T_wc: jnp.ndarray         # [4, 4] PnP pose (world <- camera)
    n_tracked: jnp.ndarray    # scalar int32
    n_pnp_inliers: jnp.ndarray
    kf_wanted: jnp.ndarray    # scalar bool (should_add_keyframe)


class KeyframeStepResult(NamedTuple):
    parallax_ok: jnp.ndarray  # scalar bool — host accepts the rest iff true
    map: MapState
    obs: FrameObs             # re-detected observations with landmark ids
    n_new_landmarks: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("tcfg", "fcfg"))
def track_step(prev_pyr, cur_pyr, prev_obs: FrameObs, m: MapState,
               K: jnp.ndarray, key: jax.Array, tracking_count: jnp.ndarray,
               tcfg: TrackerConfig, fcfg: FrontendConfig,
               d: jnp.ndarray | None = None,
               T_pred_wc: jnp.ndarray | None = None) -> TrackStepResult:
    """Per-frame hot path (reference tracker.cpp:289-319).

    `d` ([5] plumb-bob coefficients or None for rectified input) is consumed
    only by PnP — exactly the reference's use of `d_` (tracker.cpp:309):
    tracked pixels are undistorted once per frame and PnP runs on ideal
    pinhole coordinates (geometry/distortion.py).

    `T_pred_wc` ([4, 4] or None): constant-velocity pose prediction for
    THIS frame. When given and fcfg.lk_predictive, every tracked landmark
    is projected under it and LK starts at fcfg.lk_start_level from the
    predicted displacement instead of running the full coarse-to-fine
    capture from zero (ops/lk.lk_track docstring). Slots without a live
    landmark fall back to the mean predicted flow (a pure-translation
    estimate — better than zero, exact for distant points)."""
    L = m.lm_valid.shape[0]
    track_valid = prev_obs.valid & (prev_obs.lm_id >= 0)
    ids0 = jnp.clip(prev_obs.lm_id, 0, L - 1)
    if T_pred_wc is not None and fcfg.lk_predictive:
        from ros2_mono_vo_tpu.geometry.projection import project_points
        pred_ok = track_valid & m.lm_valid[ids0]
        uv_pred, z_pred = project_points(K, se3_inverse(T_pred_wc),
                                         m.lm_xyz[ids0])
        pred_ok = pred_ok & (z_pred > 1e-3)
        init_flow = uv_pred - prev_obs.uv
        nv = jnp.maximum(jnp.sum(pred_ok), 1)
        mean_flow = (jnp.sum(jnp.where(pred_ok[:, None], init_flow, 0.0), 0)
                     / nv)
        init_flow = jnp.where(pred_ok[:, None], init_flow, mean_flow)
        # a wild prior (bad depth / degenerate prediction) must not fling
        # the patch gather off-image: the in_patch gate recovers anything
        # within the finer levels' headroom anyway
        init_flow = jnp.clip(jnp.nan_to_num(init_flow), -80.0, 80.0)
        flow = lk_track(prev_pyr, cur_pyr, prev_obs.uv, track_valid,
                        win=fcfg.lk_window, levels=fcfg.lk_levels,
                        iters=fcfg.lk_iterations, init_flow=init_flow,
                        start_level=fcfg.lk_start_level)
    else:
        flow = lk_track(prev_pyr, cur_pyr, prev_obs.uv, track_valid,
                        win=fcfg.lk_window, levels=fcfg.lk_levels,
                        iters=fcfg.lk_iterations)
    good = flow.status & (flow.err < tcfg.tracking_error_thresh) & track_valid
    n_tracked = jnp.sum(good)

    ids = jnp.clip(prev_obs.lm_id, 0, L - 1)
    X = m.lm_xyz[ids]
    pnp_valid = good & m.lm_valid[ids]
    # The reference runs pnp_iterations (=100) sequential RANSAC rounds
    # (tracker.cpp:309); hypothesis-parallel equivalent = that many minimal
    # sets drawn at once, rounded up to the TPU lane multiple.
    n_hyp = -(-tcfg.pnp_iterations // 128) * 128
    uv_pnp = flow.uv if d is None else undistort_pixels(K, flow.uv, d)
    pnp = solve_pnp_ransac(K, X, uv_pnp, pnp_valid, tcfg.pnp_reproj_thresh,
                           key, num_hypotheses=n_hyp, refine_iters=10)
    T_wc = se3_inverse(pnp.model)

    # keyframe decision (tracker.cpp:118-136): too few obs | too many frames
    # since last KF | significant motion vs last KF
    T_kf_wc = m.kf_pose_wc[last_kf_slot(m)]
    rel = se3_inverse(T_kf_wc) @ T_wc
    trans = jnp.linalg.norm(rel[:3, 3])
    rot = rotation_angle(rel[:3, :3])
    kf_wanted = ((n_tracked < tcfg.min_observations_before_triangulation)
                 | (tracking_count > tcfg.max_tracking_after_keyframe)
                 | (trans > tcfg.max_translation_from_keyframe)
                 | (rot > tcfg.max_rotation_from_keyframe))

    return TrackStepResult(
        obs=FrameObs(uv=flow.uv, lm_id=prev_obs.lm_id, valid=good),
        T_wc=T_wc, n_tracked=n_tracked, n_pnp_inliers=pnp.count,
        kf_wanted=kf_wanted)


@functools.partial(jax.jit, static_argnames=("tcfg", "fcfg"))
def keyframe_step(image: jnp.ndarray, tracked: FrameObs, T_wc: jnp.ndarray,
                  m: MapState, K: jnp.ndarray, key: jax.Array,
                  tcfg: TrackerConfig, fcfg: FrontendConfig) -> KeyframeStepResult:
    """Keyframe creation (reference tracker.cpp:182-268): parallax gate, ORB
    re-detect, Lowe match to the last keyframe, triangulate, reuse-or-allocate
    landmarks, append keyframe. The host discards everything if parallax_ok
    is false (the map is functional — no rollback needed)."""
    k_par, k_unused = jax.random.split(key)
    L = m.lm_valid.shape[0]
    n = fcfg.max_features        # feature-slot count of the NEW keyframe
    last = last_kf_slot(m)

    # --- has_parallax (tracker.cpp:237-268), index-aligned by landmark id ---
    uv_by_lm, present = landmark_uv_lookup(m, last)
    ids = jnp.clip(tracked.lm_id, 0, L - 1)
    pts_kf = uv_by_lm[ids]
    pmask = tracked.valid & (tracked.lm_id >= 0) & present[ids]
    parallax_ok, _, _ = check_parallax(
        pts_kf, tracked.uv, pmask, tcfg.ransac_reproj_thresh,
        tcfg.f_inlier_thresh, tcfg.model_score_thresh, k_par,
        num_hypotheses=fcfg.ransac_hypotheses)

    # --- re-detect + match to last keyframe (tracker.cpp:184-191) ---
    feats = detect_and_describe(image, fcfg)
    mm = match_descriptors(m.last_kf_desc, m.last_kf_desc_valid,
                           feats.desc, feats.valid, tcfg.lowes_distance_ratio)
    cur_uv = feats.uv[mm.idx]             # aligned to last-KF slots
    cur_desc = feats.desc[mm.idx]

    # --- triangulate with PnP pose + last KF pose (tracker.cpp:203-209) ---
    T_kf_cw = se3_inverse(m.kf_pose_wc[last])
    T_cur_cw = se3_inverse(T_wc)
    pts3d, keep = triangulate_and_filter(
        K, T_kf_cw, T_cur_cw, m.kf_uv[last], cur_uv,
        valid=mm.valid & m.kf_obs_valid[last])
    quality = triangulation_quality_mask(
        K, T_kf_cw, T_cur_cw, pts3d, m.kf_uv[last], cur_uv,
        reproj_thresh=(tcfg.tri_reproj_thresh
                       if tcfg.tri_reproj_thresh > 0 else None),
        min_parallax_deg=(tcfg.tri_min_parallax_deg
                          if tcfg.tri_min_parallax_deg > 0 else None))

    # --- reuse existing landmark ids, allocate for the rest (:212-228);
    # reuse follows the reference's chirality-only rule, NEW allocations
    # additionally pass the quality gates (see triangulation_quality_mask) ---
    kf_lmid = m.kf_lm_id[last]
    reuse = keep & (kf_lmid >= 0)
    new = keep & quality & (kf_lmid < 0)
    # free slots whose landmarks fell off the keyframe ring (the live
    # tracked bank and the last KF's ids stay protected) so capacity
    # pressure recycles instead of dropping — see state.recycle_landmarks
    m0 = recycle_landmarks(m, jnp.where(tracked.valid, tracked.lm_id, -1))
    m1, new_ids = allocate_landmarks(m0, pts3d, cur_desc, new)
    assigned = jnp.where(reuse, kf_lmid, new_ids)     # -1 where neither
    # backfill new ids into the last keyframe's observations
    kf_lmid_updated = jnp.where(new & (new_ids >= 0), new_ids, kf_lmid)
    m2 = m1._replace(kf_lm_id=m1.kf_lm_id.at[last].set(kf_lmid_updated))
    # the backfilled ids are referenced by the LAST keyframe (index
    # kf_count-1); record that in lm_last_kf — the new keyframe's own
    # scatter below can miss them when duplicate matches drop an id from
    # cur_lm_id (referenced_landmarks would otherwise free live landmarks)
    L_cap = m2.lm_last_kf.shape[0]
    bf_slot = jnp.where(m.kf_obs_valid[last] & (kf_lmid_updated >= 0),
                        kf_lmid_updated, L_cap)
    m2 = m2._replace(lm_last_kf=m2.lm_last_kf.at[bf_slot].max(
        m.kf_count - 1, mode="drop"))

    # --- scatter assigned ids to the new frame's own slots ---
    ok = assigned >= 0
    slot = jnp.where(ok, mm.idx, n)
    cur_lm_id = jnp.full((n,), -1, jnp.int32).at[slot].set(
        jnp.where(ok, assigned, -1), mode="drop")

    m3 = add_keyframe(m2, T_wc, feats.uv, cur_lm_id, feats.valid, feats.desc)
    return KeyframeStepResult(
        parallax_ok=parallax_ok,
        map=m3,
        obs=compact_obs(
            FrameObs(uv=feats.uv, lm_id=cur_lm_id, valid=feats.valid),
            fcfg.max_track_points),
        n_new_landmarks=jnp.sum(new_ids >= 0))


class RelocStepResult(NamedTuple):
    success: jnp.ndarray      # scalar bool
    T_wc: jnp.ndarray         # [4, 4] recovered pose (valid iff success)
    obs: FrameObs             # frame observations with landmark ids attached
    n_inliers: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("tcfg", "fcfg"))
def relocalize_step(image: jnp.ndarray, m: MapState, K: jnp.ndarray,
                    key: jax.Array, tcfg: TrackerConfig,
                    fcfg: FrontendConfig,
                    d: jnp.ndarray | None = None) -> RelocStepResult:
    """Relocalization attempt from LOST — beyond the reference, whose LOST is
    terminal (tracker.cpp:277-279; README.md:146 lists recovery as roadmap).

    TPU-native: ORB re-detect, then one MXU Hamming matmul matches the
    frame's descriptors against the ENTIRE landmark descriptor bank
    ([N, B] x [B, L] — global place recognition, not just last-keyframe),
    Lowe-ratio filter, PnP-RANSAC on the surviving 2D-3D pairs."""
    feats = detect_and_describe(image, fcfg)
    mm = match_descriptors(feats.desc, feats.valid,
                           m.lm_desc.astype(jnp.float32), m.lm_valid,
                           tcfg.lowes_distance_ratio)
    X = m.lm_xyz[mm.idx]
    uv_pnp = feats.uv if d is None else undistort_pixels(K, feats.uv, d)
    pnp = solve_pnp_ransac(K, X, uv_pnp, mm.valid, tcfg.pnp_reproj_thresh,
                           key, num_hypotheses=fcfg.ransac_hypotheses,
                           refine_iters=10)
    success = pnp.count >= tcfg.reloc_min_inliers
    lm_id = jnp.where(mm.valid & pnp.inliers, mm.idx, -1).astype(jnp.int32)
    return RelocStepResult(
        success=success, T_wc=se3_inverse(pnp.model),
        obs=compact_obs(
            FrameObs(uv=feats.uv, lm_id=lm_id, valid=feats.valid),
            fcfg.max_track_points),
        n_inliers=pnp.count)


class Tracker:
    """Host-side state machine (reference tracker.hpp:20-25).

    Holds the previous frame's pyramid + observations on device; all
    numerics live in the jitted steps above.
    """

    def __init__(self, tcfg: TrackerConfig, fcfg: FrontendConfig,
                 d=None):
        self.tcfg = tcfg
        self.fcfg = fcfg
        # [5] plumb-bob coefficients, used only by PnP (reference
        # tracker.cpp:309 passes d_; everywhere else assumes rectified)
        self.d = None if d is None else jnp.asarray(d, jnp.float32)
        self.state = TrackerState.INITIALIZING
        self.prev_pyr = None
        self.prev_obs: Optional[FrameObs] = None
        self.tracking_count = 0
        self._last_pose = jnp.eye(4, dtype=jnp.float32)
        self._vel = jnp.eye(4, dtype=jnp.float32)

    def reset(self) -> None:
        self.state = TrackerState.INITIALIZING
        self.prev_pyr = None
        self.prev_obs = None
        self.tracking_count = 0
        self._last_pose = jnp.eye(4, dtype=jnp.float32)
        self._vel = jnp.eye(4, dtype=jnp.float32)

    def seed(self, pyr, obs: FrameObs) -> None:
        """Seed from the initializer's reference frame (the TRACKING
        transition at tracker.cpp:282-286, fed by mono_vo.cpp:104-112)."""
        self.prev_pyr = pyr
        self.prev_obs = compact_obs(obs, self.fcfg.max_track_points)
        self.state = TrackerState.TRACKING
        self.tracking_count = 0
        self._last_pose = jnp.eye(4, dtype=jnp.float32)
        self._vel = jnp.eye(4, dtype=jnp.float32)

    def update(self, image: jnp.ndarray, m: MapState, K: jnp.ndarray,
               key: jax.Array):
        """Process one frame. Returns (map, T_wc or None, info dict)."""
        if self.state == TrackerState.LOST:
            if self.tcfg.enable_relocalization:
                rel = relocalize_step(image, m, K, key, self.tcfg, self.fcfg,
                                      d=self.d)
                if bool(jax.device_get(rel.success)):
                    self.prev_pyr = build_lk_pyramid(image, self.fcfg.lk_levels)
                    self.prev_obs = rel.obs
                    self.state = TrackerState.TRACKING
                    self.tracking_count = 0
                    self._last_pose = jnp.asarray(rel.T_wc)
                    self._vel = jnp.eye(4, dtype=jnp.float32)
                    return m, rel.T_wc, {"state": self.state,
                                         "relocalized": True,
                                         "n_inliers": int(rel.n_inliers)}
            return m, None, {"state": self.state}
        if self.state == TrackerState.INITIALIZING:
            # The seed() path is how tracking actually starts; update() before
            # seeding just waits (reference returns nullopt).
            return m, None, {"state": self.state}

        cur_pyr = build_lk_pyramid(image, self.fcfg.lk_levels)
        k_track, k_kf = jax.random.split(key)
        # constant-velocity prediction (same model as the device engines'
        # VOCarry.vel_wc; identity until two tracked frames exist)
        T_pred = None
        if self.fcfg.lk_predictive:
            T_pred = self._last_pose @ self._vel
        res = track_step(self.prev_pyr, cur_pyr, self.prev_obs, m, K,
                         k_track, jnp.int32(self.tracking_count),
                         self.tcfg, self.fcfg, d=self.d,
                         T_pred_wc=T_pred)
        # one fused device->host fetch for all control scalars (the tunnel
        # to the TPU makes separate fetches expensive)
        n_tracked, n_pnp, kf_wanted = jax.device_get(
            (res.n_tracked, res.n_pnp_inliers, res.kf_wanted))
        n_tracked = int(n_tracked)
        if n_tracked < self.tcfg.min_tracked_points:
            self.state = TrackerState.LOST   # sticky (tracker.cpp:292-296)
            return m, None, {"state": self.state, "n_tracked": n_tracked}

        self.tracking_count += 1
        from ros2_mono_vo_tpu.geometry.se3 import se3_inverse as _inv
        self._vel = _inv(self._last_pose) @ res.T_wc
        self._last_pose = res.T_wc
        obs = res.obs
        info = {"state": self.state, "n_tracked": n_tracked,
                "n_pnp_inliers": int(n_pnp),
                "kf_wanted": bool(kf_wanted), "kf_added": False}

        if bool(kf_wanted):
            kf = keyframe_step(image, res.obs, res.T_wc, m, K, k_kf,
                               self.tcfg, self.fcfg)
            if bool(kf.parallax_ok):
                m = kf.map
                obs = kf.obs
                self.tracking_count = 0
                info["kf_added"] = True
                info["n_new_landmarks"] = int(kf.n_new_landmarks)

        self.prev_pyr = cur_pyr
        self.prev_obs = obs
        return m, res.T_wc, info
