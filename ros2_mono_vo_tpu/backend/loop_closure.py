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
from ros2_mono_vo_tpu.pipeline.state import MapState, last_kf_slot


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


# ---------------------------------------------------------------------------
# Engine integration: detect -> verify -> pose-graph -> map correction
# ---------------------------------------------------------------------------


class LoopCloseInfo(NamedTuple):
    """Scalar outcome of one loop-closure attempt (host-fetchable)."""

    closed: jnp.ndarray       # bool — a closure was applied
    cand_slot: jnp.ndarray    # int32 ring slot of the matched keyframe
    cand_index: jnp.ndarray   # int32 ABSOLUTE keyframe index of the match
    query_index: jnp.ndarray  # int32 absolute index of the query keyframe
    in_ring: jnp.ndarray      # bool — candidate was still in the PGO ring
    T_ab: jnp.ndarray         # [4, 4] measured constraint (cand <- query);
    #   the host collects these as edges for full-trajectory pose graph
    score: jnp.ndarray        # place-recognition similarity
    n_inliers: jnp.ndarray    # geometric-verification PnP inliers
    pg_cost0: jnp.ndarray     # pose-graph cost before optimization
    pg_cost1: jnp.ndarray     # pose-graph cost after


def _empty_info(dtype=jnp.float32) -> LoopCloseInfo:
    z = jnp.float32(0.0)
    return LoopCloseInfo(closed=jnp.asarray(False),
                         cand_slot=jnp.int32(-1),
                         cand_index=jnp.int32(-1),
                         query_index=jnp.int32(-1),
                         in_ring=jnp.asarray(False),
                         T_ab=jnp.eye(4, dtype=jnp.float32),
                         score=z,
                         n_inliers=jnp.int32(0), pg_cost0=z, pg_cost1=z)


def detect_loop_db(m: MapState, min_gap: int = 10,
                   sim_thresh: float = 0.7,
                   max_covisible: int | None = None):
    """Best loop candidate for the LATEST keyframe over the persistent
    keyframe database (so loops longer than the ring are still found).

    Candidates COVISIBLE with the query (sharing > max_covisible live
    landmark ids) are excluded from the argmax — they are odometry overlap,
    not loops, and their saturated similarity would shadow true revisits.

    Returns (db_slot, abs_index, score, ok)."""
    from ros2_mono_vo_tpu.pipeline.state import kdb_index_of_slot, \
        last_kf_slot
    q = m.kdb_summary[(m.kf_count - 1) % m.kdb_valid.shape[0]]
    sims = m.kdb_summary @ q                            # [KL]
    idx = kdb_index_of_slot(m)                          # [KL] abs index
    query_idx = m.kf_count - 1
    eligible = (idx >= 0) & (idx <= query_idx - min_gap)
    if max_covisible is not None:
        L = m.lm_valid.shape[0]
        kmax = m.kf_valid.shape[0]
        query = last_kf_slot(m)
        q_ids = jnp.where(m.kf_obs_valid[query] & (m.kf_lm_id[query] >= 0),
                          m.kf_lm_id[query], -1)
        q_present = jnp.zeros((L,), bool).at[
            jnp.where(q_ids >= 0, q_ids, L)].set(True, mode="drop")
        # shared ids vs the db snapshot (compact, works beyond the ring)
        shared_db = jnp.sum(
            jnp.where(m.kdb_lm_id >= 0,
                      q_present[jnp.clip(m.kdb_lm_id, 0, L - 1)], False),
            axis=1)                                     # [KL]
        # and vs the FULL ring observations for candidates still in the
        # ring (the 128-obs snapshot undercounts sharing with neighbors)
        ring_ok = m.kf_obs_valid & (m.kf_lm_id >= 0) & m.kf_valid[:, None]
        shared_ring_kf = jnp.sum(
            jnp.where(ring_ok, q_present[jnp.clip(m.kf_lm_id, 0, L - 1)],
                      False), axis=1)                   # [Kmax]
        in_ring_slot = idx >= m.kf_count - kmax
        # The id-based gate applies ONLY to in-ring candidates: their
        # landmark ids are protected from recycling (state.recycle_landmarks
        # protection-set invariant), so id equality means true covisibility.
        # Beyond-ring db snapshots hold creation-time ids that may alias
        # freshly recycled slots — counting those would spuriously exclude
        # true revisits (ADVICE round-3 #2) — and a beyond-ring candidate is
        # >= ring-size keyframes old, far past odometry overlap, so no
        # covisibility exclusion is needed there.
        shared = jnp.where(
            in_ring_slot,
            jnp.maximum(shared_db,
                        shared_ring_kf[jnp.clip(idx, 0, None) % kmax]),
            jnp.zeros_like(shared_db))
        eligible = eligible & (shared <= max_covisible)
    sims = jnp.where(eligible, sims, -2.0)
    best = jnp.argmax(sims)
    return (best.astype(jnp.int32), idx[best], sims[best],
            sims[best] > sim_thresh)


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def verify_loop_db(m: MapState, cand_dbslot: jnp.ndarray, K: jnp.ndarray,
                   key: jax.Array, lowe_ratio: float = 0.7,
                   reproj_thresh: float = 4.0, min_inliers: int = 30,
                   num_hypotheses: int = 256) -> LoopConstraint:
    """Geometric verification against a database entry: match the LATEST
    keyframe's descriptors to the candidate's compact observation set and
    PnP the query against the candidate's FROZEN landmark snapshot.

    The constraint scale is the candidate's local scale at its creation —
    exactly what a pose-graph edge should carry."""
    desc_a = m.kdb_desc[cand_dbslot].astype(jnp.float32)   # [C, B]
    valid_a = m.kdb_obs_valid[cand_dbslot]
    mm = match_descriptors(desc_a, valid_a, m.last_kf_desc,
                           m.last_kf_desc_valid, lowe_ratio)
    X = m.kdb_xyz[cand_dbslot]                             # [C, 3]
    last = last_kf_slot(m)
    uv_b = m.kf_uv[last][mm.idx]                           # [C, 2]
    pnp = solve_pnp_ransac(K, X, uv_b, mm.valid, reproj_thresh, key,
                           num_hypotheses=num_hypotheses)
    T_b_wc = se3_inverse(pnp.model)
    T_a_wc = m.kdb_pose_wc[cand_dbslot]
    T_ab = se3_inverse(T_a_wc) @ T_b_wc
    return LoopConstraint(T_ab=T_ab, n_inliers=pnp.count,
                          ok=pnp.count >= min_inliers)


def close_loop_and_correct(m: MapState, pose_wc: jnp.ndarray,
                           K: jnp.ndarray, key: jax.Array, *,
                           min_gap: int = 10, sim_thresh: float = 0.7,
                           lowe_ratio: float = 0.7,
                           reproj_thresh: float = 4.0,
                           min_inliers: int = 30,
                           min_inliers_far: int | None = None,
                           max_covisible: int = 10,
                           num_hypotheses: int = 256,
                           pgo_iterations: int = 15):
    """One full loop-closure attempt against the latest keyframe.

    detect_loop (descriptor matmul) -> verify_loop (Lowe + PnP RANSAC) ->
    pose graph over the keyframe ring (odometry backbone + the loop edge) ->
    write optimized poses back into the ring, re-anchor every landmark by the
    correction of the most recent ring keyframe that observes it (the classic
    correct-with-reference-keyframe map update), and correct the current
    tracking pose by the last keyframe's correction.

    This is the engine-side realization of the reference's roadmap "Loop
    Closing" + "Pose Graph Optimization" (reference README.md:97). Everything
    is device code under `lax.cond`s: no closure, (almost) no cost.

    Returns (MapState, pose_wc [4,4], LoopCloseInfo).
    """
    from ros2_mono_vo_tpu.backend.pose_graph import (PoseGraph, graph_cost,
                                                     odometry_edges,
                                                     optimize_pose_graph)

    kmax = m.kf_valid.shape[0]
    L = m.lm_valid.shape[0]
    query = last_kf_slot(m)
    query_idx = m.kf_count - 1
    # place recognition over the persistent db: loops longer than the ring
    # are found too (VERDICT round-2 #6)
    dbslot, cand_idx, cand_score, cand_ok = detect_loop_db(
        m, min_gap=min_gap, sim_thresh=sim_thresh,
        max_covisible=max_covisible)
    in_ring = cand_idx >= m.kf_count - kmax
    cand_ring_slot = (cand_idx % kmax).astype(jnp.int32)
    cand = LoopCandidate(slot=cand_ring_slot, score=cand_score, ok=cand_ok)

    def no_close(_):
        return m, pose_wc, _empty_info()._replace(
            cand_slot=cand.slot, cand_index=cand_idx, query_index=query_idx,
            in_ring=in_ring, score=cand.score)

    def attempt(_):
        con = verify_loop_db(m, dbslot, K, key,
                             lowe_ratio=lowe_ratio,
                             reproj_thresh=reproj_thresh,
                             min_inliers=min_inliers,
                             num_hypotheses=num_hypotheses)
        # beyond-ring closures teleport the map rigidly — require stronger
        # geometric evidence than the PGO-smoothed in-ring path
        far_bar = (min_inliers if min_inliers_far is None
                   else min_inliers_far)
        bar = jnp.where(in_ring, min_inliers, far_bar)
        con = con._replace(ok=con.n_inliers >= bar)

        def do_close(_):
            return jax.lax.cond(in_ring, close_in_ring, close_beyond_ring,
                                con)

        def close_beyond_ring(con):
            # Candidate fell off the PGO ring: apply the measured constraint
            # as a RIGID correction of the live map (ring poses, landmarks,
            # current pose, and the db entries newer than the candidate) —
            # the classic teleport-on-closure; finalize()'s full-trajectory
            # pose graph smooths it afterwards.
            from ros2_mono_vo_tpu.pipeline.state import kdb_index_of_slot
            T_b_target = m.kdb_pose_wc[dbslot] @ con.T_ab
            T_b_cur = m.kf_pose_wc[query]
            delta = T_b_target @ se3_inverse(T_b_cur)      # [4, 4]
            kf_pose = jnp.where(m.kf_valid[:, None, None],
                                delta[None] @ m.kf_pose_wc, m.kf_pose_wc)
            X_new = m.lm_xyz @ delta[:3, :3].T + delta[:3, 3]
            dbidx = kdb_index_of_slot(m)
            newer = (dbidx > cand_idx)[:, None, None]
            kdb_pose = jnp.where(newer, delta[None] @ m.kdb_pose_wc,
                                 m.kdb_pose_wc)
            kdb_xyz = jnp.where(
                newer,
                m.kdb_xyz @ delta[:3, :3].T + delta[:3, 3], m.kdb_xyz)
            m_new = m._replace(kf_pose_wc=kf_pose, lm_xyz=X_new,
                               kdb_pose_wc=kdb_pose, kdb_xyz=kdb_xyz)
            pose_new = delta @ pose_wc
            info = LoopCloseInfo(closed=jnp.asarray(True),
                                 cand_slot=cand.slot, cand_index=cand_idx,
                                 query_index=query_idx,
                                 in_ring=jnp.asarray(False),
                                 T_ab=con.T_ab, score=cand.score,
                                 n_inliers=con.n_inliers,
                                 pg_cost0=jnp.float32(0.0),
                                 pg_cost1=jnp.float32(0.0))
            return m_new, pose_new, info

        def close_in_ring(con):
            # --- ring -> temporally ordered pose-graph nodes ---
            first = jnp.where(m.kf_count > kmax, m.kf_count % kmax, 0)
            order = (first + jnp.arange(kmax)) % kmax
            T_old = m.kf_pose_wc[order]                # [Kmax, 4, 4]
            nvalid = m.kf_valid[order]
            ei, ej, Tij, w = odometry_edges(T_old, nvalid)
            # loop edge between the ordered positions of (cand, query)
            a_ord = ((cand.slot - first) % kmax).astype(jnp.int32)
            q_ord = ((query - first) % kmax).astype(jnp.int32)
            edge_i = jnp.concatenate([ei, a_ord[None]])
            edge_j = jnp.concatenate([ej, q_ord[None]])
            T_edges = jnp.concatenate([Tij, con.T_ab[None]])
            weights = jnp.concatenate([w, jnp.ones((1,), w.dtype)])
            fixed = (jnp.arange(kmax) == 0) | ~nvalid
            g = PoseGraph(T_w=T_old, edge_i=edge_i, edge_j=edge_j,
                          T_ij=T_edges, edge_weight=weights, fixed=fixed)
            cost0 = graph_cost(g)
            T_new, cost1 = optimize_pose_graph(g, iterations=pgo_iterations)

            # --- write poses back to the ring ---
            kf_pose = m.kf_pose_wc.at[order].set(
                jnp.where(nvalid[:, None, None], T_new, T_old))

            # --- landmark re-anchoring: each landmark moves with the most
            # recent ring keyframe that observes it ---
            delta = T_new @ se3_inverse(T_old)         # [Kmax, 4, 4]
            obs_ok = ((m.kf_lm_id >= 0) & m.kf_obs_valid
                      & m.kf_valid[:, None])            # [Kmax, N]
            slot_lm = jnp.where(obs_ok, m.kf_lm_id, L)
            # temporal order (1-based; 0 = not observed in the ring)
            o_of_slot = ((jnp.arange(kmax) - first) % kmax + 1).astype(jnp.int32)
            o_bc = jnp.broadcast_to(o_of_slot[:, None], slot_lm.shape)
            anchor = jnp.zeros((L,), jnp.int32).at[slot_lm.reshape(-1)].max(
                o_bc.reshape(-1), mode="drop")          # [L] in [0, Kmax]
            delta_ext = jnp.concatenate(
                [jnp.eye(4, dtype=delta.dtype)[None], delta])  # [Kmax+1, 4, 4]
            # gather-as-matmul: [L, Kmax+1] one-hot @ [Kmax+1, 16]
            onehot = (anchor[:, None]
                      == jnp.arange(kmax + 1)[None, :]).astype(delta.dtype)
            D = (onehot @ delta_ext.reshape(kmax + 1, 16)).reshape(L, 4, 4)
            X_new = jnp.einsum("lij,lj->li", D[:, :3, :3], m.lm_xyz) \
                + D[:, :3, 3]

            # --- current tracking pose moves with the last keyframe ---
            pose_new = delta[q_ord] @ pose_wc

            # --- keep the db's ring-member entries in sync with the
            # corrected ring poses (the db IS the full-trajectory graph
            # finalize() optimizes — stale ring members would fight it) ---
            from ros2_mono_vo_tpu.pipeline.state import kdb_index_of_slot
            KL = m.kdb_valid.shape[0]
            dbidx = kdb_index_of_slot(m)                 # [KL]
            ring_member = dbidx >= m.kf_count - kmax
            # ordered position of ring slot (dbidx % kmax) in `order`
            pos = ((jnp.clip(dbidx, 0, None) % kmax) - first) % kmax
            D_db = delta[jnp.clip(pos, 0, kmax - 1)]     # [KL, 4, 4]
            eye = jnp.broadcast_to(jnp.eye(4, dtype=delta.dtype),
                                   D_db.shape)
            D_db = jnp.where(ring_member[:, None, None], D_db, eye)
            kdb_pose = D_db @ m.kdb_pose_wc
            kdb_xyz = jnp.einsum("kij,kcj->kci", D_db[:, :3, :3],
                                 m.kdb_xyz) + D_db[:, None, :3, 3]

            m_new = m._replace(kf_pose_wc=kf_pose, lm_xyz=X_new,
                               kdb_pose_wc=kdb_pose, kdb_xyz=kdb_xyz)
            info = LoopCloseInfo(closed=jnp.asarray(True),
                                 cand_slot=cand.slot, cand_index=cand_idx,
                                 query_index=query_idx,
                                 in_ring=jnp.asarray(True),
                                 T_ab=con.T_ab, score=cand.score,
                                 n_inliers=con.n_inliers,
                                 pg_cost0=cost0, pg_cost1=cost1)
            return m_new, pose_new, info

        def no(_):
            return m, pose_wc, _empty_info()._replace(
                cand_slot=cand.slot, cand_index=cand_idx,
                query_index=query_idx, in_ring=in_ring, score=cand.score,
                n_inliers=con.n_inliers)

        return jax.lax.cond(con.ok, do_close, no, None)

    return jax.lax.cond(cand.ok, attempt, no_close, None)
