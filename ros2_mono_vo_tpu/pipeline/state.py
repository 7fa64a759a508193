"""VO state pytrees: the TPU-native data model.

Replaces the reference's pointer-based L2 layer (Map/Frame/KeyFrame/Landmark,
`map.hpp:13-59`, `frame.hpp:31-59`, `keyframe.hpp:14-51`, `landmark.hpp:7-18`)
with fixed-capacity device arrays + validity masks (SURVEY.md section 7
canonical state pytree). Landmark id == slot index (the reference's monotonic
counters, `keyframe.cpp:6`, `landmark.cpp:5`, map directly onto slots).

Capacity semantics vs the reference: the reference's maps are unbounded
(`map.hpp:55-56`, landmarks never pruned). A fixed-capacity device map
instead RECYCLES slots: when a keyframe falls off the ring, landmarks no
longer referenced by any ring keyframe (nor by the live tracked-point set)
become free and are reallocated before fresh slots run out
(`recycle_landmarks` + the free-slot allocator below), so long sequences
(KITTI 00 = 4,541 frames) keep allocating instead of silently dropping
every new landmark once `max_landmarks` fills.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ros2_mono_vo_tpu.config import FrontendConfig


class FrameObs(NamedTuple):
    """Per-frame observations (the reference's Frame::observations with
    landmark links, frame.hpp:10-20). Descriptors are carried separately
    when needed; LK tracking only needs uv + lm_id."""

    uv: jnp.ndarray      # [N, 2] pixel coords
    lm_id: jnp.ndarray   # [N] int32, -1 = no landmark
    valid: jnp.ndarray   # [N] bool


class MapState(NamedTuple):
    """Global map as a pytree of device arrays (reference map.hpp:55-56)."""

    # landmarks
    lm_xyz: jnp.ndarray      # [L, 3] world positions
    lm_desc: jnp.ndarray     # [L, B] int8 in {-1, +1} (representative desc)
    lm_valid: jnp.ndarray    # [L] bool
    lm_count: jnp.ndarray    # scalar int32 — number of valid landmarks
    # [L] int32 — index of the NEWEST keyframe observing each landmark
    # (maintained by add_keyframe with one [N]-sized scatter). Ring
    # membership of that index decides liveness in recycle_landmarks: the
    # full ring rescan it replaces was a 33K-index scatter that XLA lowers
    # to a ~2 ms sort pipeline per serviced lane (measured).
    lm_last_kf: jnp.ndarray
    # keyframes (ring buffer; only the last KF feeds the front-end, the ring
    # is the BA window)
    kf_pose_wc: jnp.ndarray  # [Kmax, 4, 4]
    kf_uv: jnp.ndarray       # [Kmax, N, 2]
    kf_lm_id: jnp.ndarray    # [Kmax, N] int32 (-1 = none)
    kf_obs_valid: jnp.ndarray  # [Kmax, N] bool
    kf_valid: jnp.ndarray    # [Kmax] bool
    kf_count: jnp.ndarray    # scalar int32 — total keyframes ever added
    # per-keyframe descriptors, int8 {-1,+1} — used by loop closure / place
    # recognition (the reference's roadmap); compact enough to keep for the
    # whole ring (Kmax x N x B bytes).
    kf_desc: jnp.ndarray     # [Kmax, N, B] int8
    # descriptors of the LAST keyframe in matmul-ready f32 (hot path:
    # match-to-last-keyframe, tracker.cpp:189-191).
    last_kf_desc: jnp.ndarray   # [N, B] float32 {-1, +1}
    last_kf_desc_valid: jnp.ndarray  # [N] bool
    # persistent keyframe database (slot = kf index % KL): place-recognition
    # summaries + a compact frozen (uv, xyz, desc) observation subset, so
    # loops longer than the ring close and finalize() can pose-graph the
    # whole trajectory. Landmark positions are FROZEN at creation — a loop
    # constraint needs a self-consistent snapshot, not live (recyclable)
    # landmark slots.
    kdb_pose_wc: jnp.ndarray    # [KL, 4, 4]
    kdb_summary: jnp.ndarray    # [KL, B] f32 L2-normalized mean descriptor
    kdb_uv: jnp.ndarray         # [KL, C, 2]
    kdb_lm_id: jnp.ndarray      # [KL, C] int32 landmark ids at creation
    kdb_xyz: jnp.ndarray        # [KL, C, 3] frozen world positions
    kdb_desc: jnp.ndarray       # [KL, C, B] int8 {-1, +1}
    kdb_obs_valid: jnp.ndarray  # [KL, C] bool
    kdb_valid: jnp.ndarray      # [KL] bool


def empty_map(cfg: FrontendConfig) -> MapState:
    L, Kmax, N, B = (cfg.max_landmarks, cfg.max_keyframes,
                     cfg.max_features, cfg.descriptor_bits)
    KL, C = cfg.max_keyframe_log, cfg.kdb_obs
    # Bank width Bd / kdb obs count C drop to zero when descriptors are not
    # stored: the tracking path never reads them (last_kf_desc — kept at
    # full width — is the only hot descriptor consumer), and map bytes are
    # a per-frame copy cost in the scan (see
    # FrontendConfig.store_descriptors).
    Bd = B if cfg.store_descriptors else 0
    C = C if cfg.store_descriptors else 0
    return MapState(
        lm_xyz=jnp.zeros((L, 3), jnp.float32),
        lm_desc=jnp.zeros((L, Bd), jnp.int8),
        lm_valid=jnp.zeros((L,), bool),
        lm_count=jnp.int32(0),
        lm_last_kf=jnp.full((L,), -(1 << 30), jnp.int32),
        kf_pose_wc=jnp.tile(jnp.eye(4, dtype=jnp.float32), (Kmax, 1, 1)),
        kf_uv=jnp.zeros((Kmax, N, 2), jnp.float32),
        kf_lm_id=jnp.full((Kmax, N), -1, jnp.int32),
        kf_obs_valid=jnp.zeros((Kmax, N), bool),
        kf_valid=jnp.zeros((Kmax,), bool),
        kf_count=jnp.int32(0),
        kf_desc=jnp.zeros((Kmax, N, Bd), jnp.int8),
        last_kf_desc=jnp.zeros((N, B), jnp.float32),
        last_kf_desc_valid=jnp.zeros((N,), bool),
        kdb_pose_wc=jnp.tile(jnp.eye(4, dtype=jnp.float32), (KL, 1, 1)),
        kdb_summary=jnp.zeros((KL, Bd), jnp.float32),
        kdb_uv=jnp.zeros((KL, C, 2), jnp.float32),
        kdb_lm_id=jnp.full((KL, C), -1, jnp.int32),
        kdb_xyz=jnp.zeros((KL, C, 3), jnp.float32),
        kdb_desc=jnp.zeros((KL, C, Bd), jnp.int8),
        kdb_obs_valid=jnp.zeros((KL, C), bool),
        kdb_valid=jnp.zeros((KL,), bool),
    )


def kdb_index_of_slot(m: MapState) -> jnp.ndarray:
    """[KL] absolute keyframe index held by each db slot (-1 if none yet).

    Slot s holds the largest index i < kf_count with i % KL == s."""
    KL = m.kdb_valid.shape[0]
    s = jnp.arange(KL)
    last = m.kf_count - 1
    i = last - ((last - s) % KL)
    return jnp.where(m.kdb_valid & (i >= 0), i, -1)


def last_kf_slot(m: MapState) -> jnp.ndarray:
    """Ring-buffer slot of the most recent keyframe."""
    kmax = m.kf_valid.shape[0]
    return jnp.clip(m.kf_count - 1, 0, None) % kmax


def referenced_landmarks(m: MapState,
                         protect_ids: jnp.ndarray | None = None) -> jnp.ndarray:
    """[L] bool — landmark slots referenced by any valid ring keyframe
    observation, plus any ids in `protect_ids` (e.g. the live tracked-point
    bank, whose landmarks may outlast their keyframes in the ring).

    The ring test rides `lm_last_kf` (newest keyframe observing each
    landmark, maintained incrementally by add_keyframe): a landmark is
    referenced by SOME ring keyframe iff its newest reference is itself
    still in the ring — the ring always holds the last `Kmax` keyframes.
    Equivalent to rescanning kf_lm_id, without the 33K-index scatter that
    dominated keyframe-service cost (state.py history, round 5)."""
    kmax = m.kf_valid.shape[0]
    L = m.lm_valid.shape[0]
    ref = m.lm_last_kf >= m.kf_count - kmax
    if protect_ids is not None:
        ref = ref.at[jnp.where(protect_ids >= 0, protect_ids, L)].set(
            True, mode="drop")
    return ref


def recycle_landmarks(m: MapState,
                      protect_ids: jnp.ndarray | None = None) -> MapState:
    """Free landmark slots that nothing references any more (see module
    docstring — the bounded-map replacement for the reference's unbounded
    `std::map`, map.hpp:55-56). O(Kmax·N) scatter, run at keyframe rate.

    PROTECTION-SET INVARIANT (ADVICE round-2 #2): freed slots are re-handed
    out lowest-first, so landmark ids are NOT stable over time. Every live
    holder of an lm_id outside the ring keyframes MUST be passed via
    `protect_ids` (today: the tracked-point bank) or a recycled slot will
    silently alias a new landmark under the old id. A future consumer that
    caches lm_ids long-term (e.g. persistent covisibility anchors) must
    either join the protection set or snapshot positions instead of ids —
    the keyframe database (kdb_*) does the latter by design."""
    ref = referenced_landmarks(m, protect_ids)
    lm_valid = m.lm_valid & ref
    return m._replace(lm_valid=lm_valid,
                      lm_count=jnp.sum(lm_valid.astype(jnp.int32)))


def allocate_landmarks(m: MapState, xyz: jnp.ndarray, desc: jnp.ndarray,
                       want: jnp.ndarray):
    """Assign landmark slots for `want` entries (batched free-slot allocator).

    Slots fill lowest-free-first: on a fresh map that reproduces the
    reference's monotonic ids exactly; once `recycle_landmarks` has freed
    slots they are reused, keeping long sequences allocating at full
    capacity. Entries beyond the free-slot supply get -1 (dropped).

    Args:
      xyz: [M, 3] candidate positions.
      desc: [M, B] float {-1, +1} descriptors.
      want: [M] bool — allocate a landmark for this entry.

    Returns (new MapState, assigned_ids [M] int32 with -1 where not
    allocated or out of capacity).
    """
    L = m.lm_valid.shape[0]
    M = want.shape[0]
    free_slots = jnp.nonzero(~m.lm_valid, size=M, fill_value=L)[0]
    rank = jnp.cumsum(want.astype(jnp.int32)) - 1
    ids = jnp.where(want, free_slots[jnp.clip(rank, 0, M - 1)], L)
    ids = jnp.where(ids >= L, -1, ids)  # out of free slots -> dropped
    ok = ids >= 0
    slot = jnp.where(ok, ids, L)  # L = scatter-to-void via mode="drop"
    lm_xyz = m.lm_xyz.at[slot].set(xyz, mode="drop")
    # bank may be zero-width (store_descriptors=False) — slice to fit
    lm_desc = m.lm_desc.at[slot].set(
        desc[..., :m.lm_desc.shape[1]].astype(jnp.int8), mode="drop")
    lm_valid = m.lm_valid.at[slot].set(True, mode="drop")
    return m._replace(lm_xyz=lm_xyz, lm_desc=lm_desc, lm_valid=lm_valid,
                      lm_count=jnp.sum(lm_valid.astype(jnp.int32))), ids


def add_keyframe(m: MapState, pose_wc: jnp.ndarray, uv: jnp.ndarray,
                 lm_id: jnp.ndarray, obs_valid: jnp.ndarray,
                 desc: jnp.ndarray) -> MapState:
    """Append a keyframe into the ring buffer (reference map.cpp:33-38) and
    its compact entry into the persistent keyframe database."""
    kmax = m.kf_valid.shape[0]
    slot = m.kf_count % kmax

    # --- db entry: summary + first C landmark-bearing observations with
    # their CURRENT landmark positions (frozen snapshot) ---
    KL = m.kdb_valid.shape[0]
    C = m.kdb_obs_valid.shape[1]
    L = m.lm_valid.shape[0]
    dslot = m.kf_count % KL
    w = obs_valid.astype(jnp.float32)[:, None]
    ssum = jnp.sum(desc * w, axis=0)
    summary = ssum / jnp.clip(jnp.linalg.norm(ssum), 1e-6, None)
    lm_ok = obs_valid & (lm_id >= 0) & m.lm_valid[jnp.clip(lm_id, 0, L - 1)]
    n = lm_ok.shape[0]
    order = jnp.argsort(jnp.where(lm_ok, 0, 1), stable=True)
    if C <= n:
        order = order[:C]
        sel_ok = lm_ok[order]
    else:
        # db slot is wider than the feature bank (kdb_obs > max_features):
        # pad with masked-out repeats of slot 0 so every kdb_* scatter below
        # stays [C]-shaped.
        sel_ok = jnp.concatenate([lm_ok[order],
                                  jnp.zeros((C - n,), bool)])
        order = jnp.concatenate([order,
                                 jnp.zeros((C - n,), order.dtype)])
    sel_ids = jnp.clip(lm_id[order], 0, L - 1)

    # newest-reference index for every landmark this keyframe observes
    # (the incremental input to referenced_landmarks' ring test; .max keeps
    # it monotone under duplicate slots)
    obs_ids_ok = obs_valid & (lm_id >= 0)
    lm_slot = jnp.where(obs_ids_ok, lm_id, L)
    lm_last_kf = m.lm_last_kf.at[lm_slot].max(m.kf_count, mode="drop")

    # descriptor banks / kdb snapshots may be zero-width
    # (store_descriptors=False) — slice every write to the stored width
    Bd = m.kf_desc.shape[-1]
    return m._replace(
        lm_last_kf=lm_last_kf,
        kf_pose_wc=m.kf_pose_wc.at[slot].set(pose_wc),
        kf_uv=m.kf_uv.at[slot].set(uv),
        kf_lm_id=m.kf_lm_id.at[slot].set(lm_id),
        kf_obs_valid=m.kf_obs_valid.at[slot].set(obs_valid),
        kf_valid=m.kf_valid.at[slot].set(True),
        kf_count=m.kf_count + 1,
        kf_desc=m.kf_desc.at[slot].set(desc[:, :Bd].astype(jnp.int8)),
        last_kf_desc=desc,
        last_kf_desc_valid=obs_valid,
        kdb_pose_wc=m.kdb_pose_wc.at[dslot].set(pose_wc),
        kdb_summary=m.kdb_summary.at[dslot].set(
            summary[:m.kdb_summary.shape[-1]]),
        kdb_uv=m.kdb_uv.at[dslot].set(uv[order]),
        kdb_lm_id=m.kdb_lm_id.at[dslot].set(
            jnp.where(sel_ok, lm_id[order], -1)),
        kdb_xyz=m.kdb_xyz.at[dslot].set(
            m.lm_xyz[sel_ids] * sel_ok[:, None]),
        kdb_desc=m.kdb_desc.at[dslot].set(
            desc[order][:, :Bd].astype(jnp.int8)),
        kdb_obs_valid=m.kdb_obs_valid.at[dslot].set(sel_ok),
        kdb_valid=m.kdb_valid.at[dslot].set(True),
    )


def landmark_uv_lookup(m: MapState, kf_slot: jnp.ndarray):
    """Build a landmark_id -> (uv, present) lookup for one keyframe.

    Replaces KeyFrame's O(1) landmark index (keyframe.hpp:50) with a dense
    scatter; fixes the reference's index-misalignment hazard in
    Tracker::has_parallax (tracker.cpp:239-240, SURVEY.md quirks) by
    construction — lookups are explicit, never positional.

    Returns (uv_by_lm [L, 2], present [L]).
    """
    L = m.lm_valid.shape[0]
    ids = m.kf_lm_id[kf_slot]
    ok = (ids >= 0) & m.kf_obs_valid[kf_slot]
    slot = jnp.where(ok, ids, L)
    uv_by_lm = jnp.zeros((L, 2), jnp.float32).at[slot].set(
        m.kf_uv[kf_slot], mode="drop")
    present = jnp.zeros((L,), bool).at[slot].set(True, mode="drop")
    return uv_by_lm, present


def landmark_points(m: MapState) -> tuple[jnp.ndarray, jnp.ndarray]:
    """All landmark positions + mask (pointcloud export, map.cpp:52-60)."""
    return m.lm_xyz, m.lm_valid


def compact_obs(obs: FrameObs, nt: int) -> FrameObs:
    """Pack landmark-bearing observations into the first `nt` slots.

    The tracker only flows observations WITH landmarks (reference
    tracker.cpp:61-62), which are far fewer than the detected-feature
    capacity; compacting them into a small fixed bank halves every
    per-point cost downstream (LK sampling matmuls, PnP residual grids).
    Runs only at keyframe/seed/reloc boundaries, never per frame.

    Stable: surviving observations keep their relative slot order. Overflow
    beyond `nt` is dropped (divergence from the reference's unbounded
    observation vector — see FrontendConfig.max_track_points).
    """
    keep = obs.valid & (obs.lm_id >= 0)
    n = keep.shape[0]
    if nt >= n:
        return FrameObs(uv=obs.uv, lm_id=jnp.where(keep, obs.lm_id, -1),
                        valid=keep)
    order = jnp.argsort(jnp.where(keep, 0, 1), stable=True)
    idx = order[:nt]
    k = keep[idx]
    return FrameObs(uv=obs.uv[idx],
                    lm_id=jnp.where(k, obs.lm_id[idx], -1),
                    valid=k)
