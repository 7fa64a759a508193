"""Loop-closure detection + constraint estimation over the keyframe ring.

Reference roadmap item "Loop Closing" (reference README.md:97), TPU-native:
place recognition is a descriptor-matmul — each keyframe is summarized by its
mean binary descriptor, all pairwise similarities are one [K, B] x [B, K]
matmul on the MXU — followed by geometric verification (full Lowe matching +
PnP RANSAC against the candidate's landmarks), which yields a metric SE(3)
constraint for the pose graph (no Sim(3) needed: the PnP runs against map
landmarks, so scale is inherited from the map).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ros2_mono_vo_tpu.geometry.se3 import se3_inverse
from ros2_mono_vo_tpu.ops.matching import match_descriptors
from ros2_mono_vo_tpu.ops.ransac import solve_pnp_ransac
from ros2_mono_vo_tpu.pipeline.state import MapState


class LoopCandidate(NamedTuple):
    slot: jnp.ndarray        # scalar int32 candidate keyframe ring slot
    score: jnp.ndarray       # scalar float similarity in [-1, 1]
    ok: jnp.ndarray          # scalar bool — passed the similarity gate


class LoopConstraint(NamedTuple):
    T_ab: jnp.ndarray        # [4, 4] measured relative pose (a <- b)
    n_inliers: jnp.ndarray   # scalar int32 PnP inliers
    ok: jnp.ndarray          # scalar bool — geometrically verified


def kf_summary_descriptors(m: MapState) -> jnp.ndarray:
    """Mean descriptor per keyframe, L2-normalized. [Kmax, B] f32."""
    d = m.kf_desc.astype(jnp.float32)                  # [K, N, B]
    w = m.kf_obs_valid.astype(jnp.float32)[..., None]
    s = jnp.sum(d * w, axis=1)
    n = jnp.linalg.norm(s, axis=-1, keepdims=True)
    return s / jnp.clip(n, 1e-6, None)


@jax.jit
def detect_loop(m: MapState, query_slot: jnp.ndarray,
                min_gap: int = 10, sim_thresh: float = 0.7) -> LoopCandidate:
    """Best loop candidate for the keyframe at `query_slot`.

    Candidates must be at least `min_gap` keyframes older than the query
    (ring distance, using kf_count bookkeeping is the caller's concern;
    with the ring, slot distance is the proxy)."""
    summaries = kf_summary_descriptors(m)              # [K, B]
    q = summaries[query_slot]
    sims = summaries @ q                               # [K]
    kmax = m.kf_valid.shape[0]
    idx = jnp.arange(kmax)
    # ring distance from query slot (most recent keyframes excluded)
    dist = (query_slot - idx) % kmax
    eligible = m.kf_valid & (dist >= min_gap) & (idx != query_slot)
    sims = jnp.where(eligible, sims, -2.0)
    best = jnp.argmax(sims)
    return LoopCandidate(slot=best.astype(jnp.int32), score=sims[best],
                         ok=sims[best] > sim_thresh)


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def verify_loop(m: MapState, cand_slot: jnp.ndarray, query_slot: jnp.ndarray,
                K: jnp.ndarray, key: jax.Array,
                lowe_ratio: float = 0.7, reproj_thresh: float = 4.0,
                min_inliers: int = 30,
                num_hypotheses: int = 256) -> LoopConstraint:
    """Geometric verification: match candidate's landmark-bearing
    observations to the query keyframe, PnP the query against the map.

    Returns the relative constraint T_ab = T_a_cw_pnp-corrected pose of b in
    a's frame (a = candidate, b = query), for the pose graph.
    """
    L = m.lm_valid.shape[0]
    desc_a = m.kf_desc[cand_slot].astype(jnp.float32)
    desc_b = m.kf_desc[query_slot].astype(jnp.float32)
    valid_a = m.kf_obs_valid[cand_slot] & (m.kf_lm_id[cand_slot] >= 0)
    valid_b = m.kf_obs_valid[query_slot]

    mm = match_descriptors(desc_a, valid_a, desc_b, valid_b, lowe_ratio)
    ids = jnp.clip(m.kf_lm_id[cand_slot], 0, L - 1)
    X = m.lm_xyz[ids]                                  # [N, 3] per a-slot
    uv_b = m.kf_uv[query_slot][mm.idx]                 # [N, 2]
    pnp_valid = mm.valid & m.lm_valid[ids]
    pnp = solve_pnp_ransac(K, X, uv_b, pnp_valid, reproj_thresh, key,
                           num_hypotheses=num_hypotheses)
    # pose of query (b) implied by candidate-consistent landmarks
    T_b_wc = se3_inverse(pnp.model)
    T_a_wc = m.kf_pose_wc[cand_slot]
    T_ab = se3_inverse(T_a_wc) @ T_b_wc
    return LoopConstraint(T_ab=T_ab, n_inliers=pnp.count,
                          ok=pnp.count >= min_inliers)
