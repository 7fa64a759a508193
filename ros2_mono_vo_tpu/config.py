"""Configuration system.

Mirrors the reference's three-tier parameter scheme (YAML defaults -> ROS
parameter server -> `RosParameterHandler::declare_and_get`, reference
`include/mono_vo/ros_parameter_handler.hpp:42-64`, `config/params.yaml:1-24`)
with frozen dataclasses: identical parameter names and defaults so reference
configs translate 1:1. Static (shape-determining, hashable) capacities are
split from the numeric thresholds so configs can be passed as jit static args.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Mapping


@dataclasses.dataclass(frozen=True)
class InitializerConfig:
    """Two-view bootstrap parameters (reference `config/params.yaml:4-11`,
    defaults also at `initializer.cpp:18-46`)."""

    occupancy_grid_div: int = 50
    kp_distribution_thresh: float = 0.5
    lowes_distance_ratio: float = 0.7
    min_matches_for_init: int = 100
    ransac_reproj_thresh: float = 1.0
    f_inlier_thresh: float = 0.5
    model_score_thresh: float = 0.56
    # Not in the reference YAML but hardcoded in the reference:
    # findEssentialMat(RANSAC, conf 0.99, thresh 1.0) at initializer.cpp:228-229
    essential_ransac_thresh: float = 1.0
    # <4 triangulated points => reset (initializer.cpp:246-249, 268-272)
    min_triangulated_points: int = 4
    # Seed-landmark quality gates (see TrackerConfig.tri_*; the seed map
    # fixes the global monocular scale, so outlier depths here are costly)
    tri_reproj_thresh: float = 4.0      # px; non-positive disables the gate
    tri_min_parallax_deg: float = 0.35  # deg; non-positive disables the gate


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    """Main-loop tracking parameters (reference `config/params.yaml:14-24`,
    defaults at `tracker.cpp:15-56`)."""

    tracking_error_thresh: float = 30.0
    min_observations_before_triangulation: int = 100
    min_tracked_points: int = 10
    max_tracking_after_keyframe: int = 10
    max_rotation_from_keyframe: float = 0.261799388  # 15 degrees
    max_translation_from_keyframe: float = 1.0
    ransac_reproj_thresh: float = 1.0
    model_score_thresh: float = 0.85
    f_inlier_thresh: float = 0.5
    lowes_distance_ratio: float = 0.7
    # The reference hardcodes solvePnPRansac(iter=100, reproj=8.0, conf=0.99)
    # and ignores its own ransac_reproj_thresh there (tracker.cpp:309, a
    # documented quirk in SURVEY.md section 3). We expose them explicitly.
    pnp_reproj_thresh: float = 8.0
    pnp_iterations: int = 100
    # Relocalization from LOST (a capability the reference explicitly lacks —
    # its LOST is terminal, tracker.cpp:277-279, README.md:146 "roadmap").
    # Off by default to preserve reference parity semantics.
    enable_relocalization: bool = False
    reloc_min_inliers: int = 30
    # Triangulated-landmark quality gates (beyond the reference, which only
    # chirality-filters — tracker.cpp:155-161 — but ships the reprojection
    # metric unused, utils.cpp:245-256). Wrong-match landmarks admitted at
    # keyframe creation measurably run the monocular map scale away.
    tri_reproj_thresh: float = 4.0      # px, both views; <=0 disables
    tri_min_parallax_deg: float = 0.35  # min ray angle for depth; <=0 disables


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    """Static capacities and kernel shape parameters (TPU-native: these fix
    every array shape so nothing recompiles at runtime).

    The feature budget mirrors `FeatureProcessor(1000)` (reference
    `mono_vo.cpp:15`, `feature_processor.hpp:15`) rounded up to the TPU lane
    multiple.
    """

    max_features: int = 1024          # >= reference's 1000, lane-aligned
    descriptor_bits: int = 256        # ORB-style 256-bit binary descriptor
    num_pyramid_levels: int = 8       # cv::ORB default nlevels
    pyramid_scale: float = 1.2        # cv::ORB default scaleFactor
    fast_threshold: float = 20.0      # cv::ORB default fastThreshold
    patch_size: int = 31              # cv::ORB default patchSize/edgeThreshold
    # Lucas-Kanade (cv::calcOpticalFlowPyrLK defaults: win 21, 3 extra levels,
    # 30 iters / 0.01 eps; reference overrides nothing, tracker.cpp:68-69)
    lk_window: int = 21
    lk_levels: int = 4
    lk_iterations: int = 10
    # Predictive LK: seed each frame's search with landmarks projected
    # under a constant-velocity pose model and start the pyramid at
    # lk_start_level instead of lk_levels-1. The coarse levels exist only
    # for capture range; with a motion prior the residual is the model's
    # acceleration error (sub-pixel at video rate), so skipping them drops
    # ~(levels-1-start)/levels of the tracker's patch gathers and GN
    # iterations. Capture around the prior is +-34 px at start level 1
    # (drift 13*2 + 8). Divergence from cv::calcOpticalFlowPyrLK's
    # zero-init defaults (reference tracker.cpp:68-69) — equivalent to its
    # OPTFLOW_USE_INITIAL_FLOW + maxLevel knobs; gated by the same ATE
    # parity bar as every other divergence.
    lk_predictive: bool = True
    lk_start_level: int = 1
    # RANSAC hypothesis batch (hypothesis-parallel engine)
    ransac_hypotheses: int = 512
    # Batched engine: max lanes serviced by the keyframe stage per frame.
    # The service batch is min(max(kf_service_lanes, ceil(B/4)), B): the
    # full-vmap service paid ALL B lanes of ORB re-detect + match +
    # triangulate whenever ANY lane fired (P(any) -> 1 as B grows — the
    # round-3 negative batch scaling); capping makes service cost track the
    # actual keyframe rate. Lanes beyond the cap defer a frame or two
    # (urgency order: longest-since-keyframe first, so no starvation).
    kf_service_lanes: int = 2
    # Hard override of the service batch: S = min(B, kf_service_cap) when
    # > 0 (the ceil(B/4) heuristic is skipped). Service cost is paid per
    # FIRE, padded to S lanes, and in steady state some lane wants a
    # keyframe almost every frame-row — so S sets the stage's cost floor
    # directly. Worth lowering when the per-lane keyframe cadence times B
    # stays under the cap; the urgency queue absorbs bursts by deferring.
    kf_service_cap: int = 0
    # Frame-to-frame tracking slot capacity. Only landmark-bearing
    # observations are LK-tracked (reference tracker.cpp:61-62 filters
    # WITH_LANDMARKS); their count is bounded by last-keyframe matches and
    # measures ~200-260 of the 1000 detected features on KITTI-like scenes
    # (512 slots ran at ~43% occupancy), so a 256 bank halves every
    # per-point cost in the hot path (LK sampling, PnP scoring) at the
    # cost of dropping overflow beyond 256 in feature-dense scenes. When
    # more survive, the lowest-slot subset is kept — divergence from the
    # reference's unbounded vector, documented here.
    max_track_points: int = 256
    # Map capacities
    max_landmarks: int = 16384
    max_keyframes: int = 64
    # Persist descriptor banks + kdb observation snapshots in the map.
    # Required by relocalization (landmark descriptor bank) and loop
    # closure (kf_desc ring + kdb place-recognition snapshots); NOT used by
    # the plain tracking path, whose only descriptor consumer is
    # last_kf_desc (kept regardless). Turning this off shrinks the per-lane
    # map pytree from ~33 MB to ~2.7 MB, which is pure profit on TPU: every
    # lax.cond branch and per-lane select in the batched scan copies the
    # whole map pytree, so map bytes are a per-FRAME cost, not a capacity
    # cost. init_carry asserts this is on when reloc/LC are enabled.
    store_descriptors: bool = True
    # Persistent keyframe database (pose + summary descriptor + a compact
    # observation subset per keyframe) — outlives the ring, so loops longer
    # than max_keyframes can still be recognized, verified, and closed, and
    # finalize() can pose-graph the WHOLE trajectory (VERDICT round-2 #6).
    max_keyframe_log: int = 512
    kdb_obs: int = 128              # landmark-bearing obs kept per db entry

    @property
    def pyramid_scales(self) -> tuple[float, ...]:
        return tuple(self.pyramid_scale ** i for i in range(self.num_pyramid_levels))


@dataclasses.dataclass(frozen=True)
class BackendConfig:
    """Sliding-window BA / pose-graph parameters (roadmap items,
    BASELINE.json configs 4-5)."""

    window_size: int = 16             # keyframes in the local BA window
    lm_iterations: int = 10
    lm_lambda_init: float = 1e-3
    lm_lambda_factor: float = 10.0
    huber_delta: float = 2.0          # pixels, robust loss on reprojection
    max_window_landmarks: int = 8192
    # In-engine local BA at keyframe cadence (reference roadmap "Local
    # Bundle Adjustment", README.md:97). Off by default to preserve
    # reference parity semantics; the bench reports both.
    enable_local_ba: bool = False
    ba_window_size: int = 8           # engine-loop window (smaller = faster)
    # At keyframe cadence every solve warm-starts from the previous call's
    # nearly-converged window, so few LM iterations are needed; profiler
    # (tools/profile_scan_ops.py): the LM scan was ~1/3 of the whole
    # batched step at 5 iterations.
    ba_iterations: int = 3
    ba_max_landmarks: int = 2048
    # Per-keyframe observation grid compaction for the in-engine window
    # problem (see extract_window obs_cap): ~300-500 of the 1024 feature
    # slots carry landmarks; every per-observation LM tensor scales with
    # the grid width.
    ba_obs_per_kf: int = 512
    # Batched engine BA placement. Default (True): BA runs IN-SCAN at
    # keyframe cadence for exactly the lanes the capped keyframe service
    # just serviced — identical semantics to the solo engine (each
    # keyframe's window refined at creation, live pose = refined newest-kf
    # pose), with cost bounded by the service width, not B. False: legacy
    # chunk-cadence mode — one all-lane vmapped BA every ba_every_frames,
    # with the live pose riding the newest keyframe's correction. Measured
    # on the KITTI-proxy bench (150 frames, B=8): 25-frame cadence left
    # worst-lane ATE at 1.55 (keyframes fire every ~2-3 frames, so most
    # fell out of the window-8 BA before ever being refined); 10-frame
    # cadence reached 0.30 vs solo 0.27; in-scan removes the remaining
    # cadence/pose-ride approximations entirely.
    batched_inscan_ba: bool = True
    ba_every_frames: int = 10
    # Loop closure + pose-graph (engine-integrated; reference README.md:97
    # roadmap). Off by default to preserve reference parity semantics.
    enable_loop_closure: bool = False
    lc_min_gap: int = 10              # min keyframe separation for candidates
    lc_sim_thresh: float = 0.7        # place-recognition similarity gate
    lc_reproj_thresh: float = 4.0     # PnP verification threshold (px)
    lc_min_inliers: int = 30          # PnP inliers to accept a closure
    # Beyond-ring closures apply a RIGID teleport (no smoothing PGO until
    # finalize), so they carry more risk — demand stronger evidence.
    lc_min_inliers_far: int = 50
    # A candidate sharing more than this many live landmark ids with the
    # query is COVISIBLE (normal odometry overlap), not a loop — closing
    # against it injects a near-identity-but-noisy constraint. True
    # revisits share ~none (old ids are unrecoverable without reloc).
    lc_max_covisible: int = 10
    # Applied closures suppress further attempts for this many keyframes:
    # place-recognition scores saturate between covisible keyframes, and a
    # train of slightly-off corrections is worse than none.
    lc_cooldown_kf: int = 8
    pgo_iterations: int = 15          # pose-graph Gauss-Newton iterations


@dataclasses.dataclass(frozen=True)
class NodeConfig:
    """Node-level parameters (reference mono_vo.cpp:27-40 declares these
    directly on the node, outside the initializer/tracker namespaces)."""

    odom_frame_id: str = "odom"
    odom_child_frame_id: str = "camera"
    odom_publish_rate: float = 30.0
    position_covariance_growth_rate: float = 0.1


@dataclasses.dataclass(frozen=True)
class VOConfig:
    initializer: InitializerConfig = InitializerConfig()
    tracker: TrackerConfig = TrackerConfig()
    frontend: FrontendConfig = FrontendConfig()
    backend: BackendConfig = BackendConfig()
    node: NodeConfig = NodeConfig()

    @staticmethod
    def from_params_yaml(params: Mapping[str, Any]) -> "VOConfig":
        """Build from a dict shaped like the reference's params.yaml
        (`mono_vo.ros__parameters.{initializer,tracker}.*`; node-level
        params sit directly under ros__parameters, mono_vo.cpp:27-40)."""
        root = params.get("mono_vo", params)
        root = root.get("ros__parameters", root)
        init_kw = dict(root.get("initializer", {}))
        trk_kw = dict(root.get("tracker", {}))
        init_fields = {f.name for f in dataclasses.fields(InitializerConfig)}
        trk_fields = {f.name for f in dataclasses.fields(TrackerConfig)}
        node_fields = {f.name for f in dataclasses.fields(NodeConfig)}
        return VOConfig(
            initializer=InitializerConfig(
                **{k: v for k, v in init_kw.items() if k in init_fields}),
            tracker=TrackerConfig(
                **{k: v for k, v in trk_kw.items() if k in trk_fields}),
            node=NodeConfig(
                **{k: v for k, v in root.items() if k in node_fields}),
        )


def level_feature_budget(cfg: FrontendConfig) -> tuple[int, ...]:
    """Per-pyramid-level feature budget with the ORB-style geometric split:
    level i gets a share proportional to (1/scale)^i, summing to max_features.
    """
    inv = [1.0 / (cfg.pyramid_scale ** i) for i in range(cfg.num_pyramid_levels)]
    total = sum(inv)
    raw = [cfg.max_features * v / total for v in inv]
    out = [int(math.floor(r)) for r in raw]
    # distribute the remainder to the finest levels
    rem = cfg.max_features - sum(out)
    for i in range(rem):
        out[i % len(out)] += 1
    return tuple(out)
