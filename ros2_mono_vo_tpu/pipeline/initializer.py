"""Two-view initialization: OBTAINING_REF -> INITIALIZING -> INITIALIZED.

TPU-native re-design of the reference Initializer (`initializer.cpp:165-313`,
state machine at `initializer.hpp:22-27`): all numeric work (matching, H/F
model-selection, essential matrix, pose recovery, triangulation, map seeding)
runs as two jitted device steps; the host only reads a handful of scalar
flags to drive the three-state machine.
"""

from __future__ import annotations

import enum
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ros2_mono_vo_tpu.config import InitializerConfig, FrontendConfig
from ros2_mono_vo_tpu.geometry.se3 import make_se3, se3_inverse
from ros2_mono_vo_tpu.geometry.projection import pixel_to_normalized
from ros2_mono_vo_tpu.geometry.triangulation import triangulate_and_filter
from ros2_mono_vo_tpu.ops.features import Features, occupancy_grid_check
from ros2_mono_vo_tpu.ops.matching import match_descriptors
from ros2_mono_vo_tpu.ops.ransac import (
    find_homography_ransac, find_fundamental_ransac, find_essential_ransac,
    recover_pose,
)
from ros2_mono_vo_tpu.pipeline.state import MapState, add_keyframe, allocate_landmarks


class InitState(enum.IntEnum):
    OBTAINING_REF = 0
    INITIALIZING = 1
    INITIALIZED = 2


class InitAttempt(NamedTuple):
    """Device outputs of one initialization attempt. Gate flags mirror the
    reference's early returns (initializer.cpp:190-272)."""

    n_matches: jnp.ndarray        # scalar int32
    score_h: jnp.ndarray          # scalar int32 (H inlier count)
    score_f: jnp.ndarray          # scalar int32 (F inlier count)
    parallax_ok: jnp.ndarray      # scalar bool
    n_pose_inliers: jnp.ndarray   # scalar int32 (E inliers after chirality vote)
    n_triangulated: jnp.ndarray   # scalar int32 (after seed-quality gates)
    n_tri_geom: jnp.ndarray       # scalar int32 (chirality-only — reference
    #   semantics: RESET keys off this count, initializer.cpp:268-272; the
    #   stricter quality gates only delay success so the baseline can grow)
    T_cur_wc: jnp.ndarray         # [4, 4] pose of current frame (world = ref cam)
    # per-REF-slot arrays (aligned to the ref frame's feature slots):
    match_idx: jnp.ndarray        # [N] int32 index into cur slots
    lm_mask: jnp.ndarray          # [N] bool — seeds a landmark
    pts3d: jnp.ndarray            # [N, 3] triangulated world points


def check_parallax(uv1, uv2, valid, icfg_thresh: jnp.ndarray,
                   f_inlier_thresh, model_score_thresh, key,
                   num_hypotheses: int = 512):
    """H-vs-F model selection (reference initializer.cpp:77-110 and
    tracker.cpp:237-268 — identical logic, both covered here).

    Returns (ok, score_h, score_f): ok iff F explains >= f_inlier_thresh of
    the matches AND score_h/score_f <= model_score_thresh.
    """
    kh, kf = jax.random.split(key)
    h = find_homography_ransac(uv1, uv2, valid, icfg_thresh, kh,
                               num_hypotheses=num_hypotheses)
    f = find_fundamental_ransac(uv1, uv2, valid, icfg_thresh, kf,
                                num_hypotheses=num_hypotheses)
    n = jnp.clip(jnp.sum(valid), 1, None)
    f_ratio = f.count.astype(jnp.float32) / n.astype(jnp.float32)
    model_score = h.count.astype(jnp.float32) / jnp.clip(
        f.count.astype(jnp.float32), 1.0, None)
    ok = (f_ratio >= f_inlier_thresh) & (model_score <= model_score_thresh)
    return ok, h.count, f.count


@functools.partial(jax.jit, static_argnames=("icfg", "fcfg"))
def init_attempt(ref: Features, cur: Features, K: jnp.ndarray,
                 key: jax.Array, icfg: InitializerConfig,
                 fcfg: FrontendConfig) -> InitAttempt:
    """One fused initialization attempt (reference initializer.cpp:182-272).

    All gates are computed unconditionally (masked); the host applies the
    same early-return policy by reading the flags.
    """
    k_par, k_e = jax.random.split(key)

    m = match_descriptors(ref.desc, ref.valid, cur.desc, cur.valid,
                          icfg.lowes_distance_ratio)
    cur_uv = cur.uv[m.idx]              # [N, 2] aligned to ref slots
    n_matches = jnp.sum(m.valid)

    parallax_ok, score_h, score_f = check_parallax(
        ref.uv, cur_uv, m.valid, icfg.ransac_reproj_thresh,
        icfg.f_inlier_thresh, icfg.model_score_thresh, k_par,
        num_hypotheses=fcfg.ransac_hypotheses)

    e = find_essential_ransac(K, ref.uv, cur_uv, m.valid,
                              icfg.essential_ransac_thresh, k_e,
                              num_hypotheses=fcfg.ransac_hypotheses)
    xy1 = pixel_to_normalized(K, ref.uv)
    xy2 = pixel_to_normalized(K, cur_uv)
    R_cw, t_cw, front, votes = recover_pose(e.model, xy1, xy2, e.inliers)
    # recoverPose semantics: the returned inlier count is E-inliers that also
    # pass the chirality vote (initializer.cpp:236-249)
    pose_inliers = e.inliers & front
    n_pose_inliers = jnp.sum(pose_inliers)

    T_cur_cw = make_se3(R_cw, t_cw)
    pts3d, keep_geom = triangulate_and_filter(
        K, jnp.eye(4, dtype=K.dtype), T_cur_cw, ref.uv, cur_uv,
        valid=pose_inliers)
    from ros2_mono_vo_tpu.geometry.triangulation import \
        triangulation_quality_mask
    quality = triangulation_quality_mask(
        K, jnp.eye(4, dtype=K.dtype), T_cur_cw, pts3d, ref.uv, cur_uv,
        reproj_thresh=(icfg.tri_reproj_thresh
                       if icfg.tri_reproj_thresh > 0 else None),
        min_parallax_deg=(icfg.tri_min_parallax_deg
                          if icfg.tri_min_parallax_deg > 0 else None))
    keep = keep_geom & quality
    n_triangulated = jnp.sum(keep)

    return InitAttempt(
        n_matches=n_matches,
        score_h=score_h,
        score_f=score_f,
        parallax_ok=parallax_ok,
        n_pose_inliers=n_pose_inliers,
        n_triangulated=n_triangulated,
        n_tri_geom=jnp.sum(keep_geom),
        T_cur_wc=se3_inverse(T_cur_cw),
        match_idx=m.idx,
        lm_mask=keep,
        pts3d=pts3d,
    )


@jax.jit
def seed_map(m0: MapState, ref: Features, cur: Features,
             attempt: InitAttempt) -> tuple[MapState, jnp.ndarray]:
    """Bootstrap the map from an accepted attempt
    (reference initializer.cpp:274-300): an observation-less origin keyframe
    at identity, landmarks from the triangulated inliers (descriptor taken
    from the CURRENT frame), and the current frame as keyframe #2 with
    landmark ids scattered to its own feature slots.

    Returns (map, cur_lm_id [N] aligned to cur slots — the tracker's seed).
    """
    n = ref.uv.shape[0]
    cur_desc_at_ref = cur.desc[attempt.match_idx]       # [N, B]
    m1, ids = allocate_landmarks(m0, attempt.pts3d, cur_desc_at_ref,
                                 attempt.lm_mask)

    # origin keyframe: identity pose, no observations
    m2 = add_keyframe(
        m1, jnp.eye(4, dtype=jnp.float32),
        jnp.zeros_like(cur.uv), jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,), bool), jnp.zeros_like(cur.desc))

    # scatter landmark ids from ref-slot alignment to cur-slot alignment
    ok = ids >= 0
    slot = jnp.where(ok, attempt.match_idx, n)
    cur_lm_id = jnp.full((n,), -1, jnp.int32).at[slot].set(
        jnp.where(ok, ids, -1), mode="drop")
    m3 = add_keyframe(m2, attempt.T_cur_wc, cur.uv, cur_lm_id,
                      cur.valid, cur.desc)
    return m3, cur_lm_id


class Initializer:
    """Host-side three-state driver (reference initializer.hpp:22-27).

    Owns no array data beyond the latched reference Features; all numerics
    are the jitted steps above.
    """

    def __init__(self, icfg: InitializerConfig, fcfg: FrontendConfig,
                 image_shape: tuple[int, int]):
        self.icfg = icfg
        self.fcfg = fcfg
        self.image_shape = image_shape
        self.state = InitState.OBTAINING_REF
        self.ref: Optional[Features] = None

    def reset(self) -> None:
        self.state = InitState.OBTAINING_REF
        self.ref = None

    def _good_distribution(self, feats: Features) -> bool:
        ok, _ = occupancy_grid_check(
            feats.uv, feats.valid, self.image_shape,
            self.icfg.occupancy_grid_div, self.icfg.kp_distribution_thresh)
        return bool(ok)

    def try_initializing(self, feats: Features, K: jnp.ndarray,
                         m: MapState, key: jax.Array):
        """Process one frame. Returns (map, cur_lm_id or None).

        cur_lm_id is non-None exactly when initialization succeeded this
        frame; the caller seeds the tracker with it (mono_vo.cpp:104-112).
        """
        if self.state == InitState.OBTAINING_REF:
            if self._good_distribution(feats):
                self.ref = feats
                self.state = InitState.INITIALIZING
            return m, None

        assert self.state == InitState.INITIALIZING and self.ref is not None
        att = init_attempt(self.ref, feats, K, key, self.icfg, self.fcfg)

        if int(att.n_matches) < self.icfg.min_matches_for_init:
            # re-test cur as the new ref, else full reset (initializer.cpp:190-201)
            if self._good_distribution(feats):
                self.ref = feats
            else:
                self.reset()
            return m, None
        if not bool(att.parallax_ok):
            return m, None  # skip frame, keep ref (initializer.cpp:220-224)
        if int(att.n_pose_inliers) < 4:
            return m, None  # skip frame (initializer.cpp:246-249)
        if int(att.n_tri_geom) < self.icfg.min_triangulated_points:
            self.reset()    # degenerate geometry (initializer.cpp:268-272)
            return m, None
        if int(att.n_triangulated) < self.icfg.min_triangulated_points:
            # geometry fine, seed quality not yet: keep ref, let the
            # baseline grow (quality gates are ours, not the reference's —
            # resetting here would re-latch the ref every 2 frames and the
            # baseline would never exceed one frame of motion)
            return m, None

        m_new, cur_lm_id = seed_map(m, self.ref, feats, att)
        self.state = InitState.INITIALIZED
        self.ref = feats
        return m_new, cur_lm_id
