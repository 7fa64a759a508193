"""Benchmark: VO frames/s/chip on a KITTI-sized synthetic sequence.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N, ...}

`value` is this framework's aggregate steady-state tracking throughput on
the current JAX default device (the real TPU chip under the driver),
measured on the north-star engine: `BatchedDeviceMonoVO` — B independent
VO lanes sharing one chip's compiled graphs and MXU (BASELINE.json
north_star "frames/s/chip"; SURVEY.md section 7 "sequential dependence":
the per-frame chain can't be batched away, so throughput/chip comes from
batching across sequences). Single-lane latency-mode fps is reported
alongside.

`vs_baseline` is measured against a faithful CPU re-execution of the
reference pipeline (ros2_mono_vo's exact OpenCV calls + parameters:
ORB-1000 detect, BFMatcher-Hamming kNN + Lowe 0.7, calcOpticalFlowPyrLK
defaults, solvePnPRansac(100, 8.0, .99), H/F model-selection RANSAC,
triangulation — see SURVEY.md section 2 kernel table). BASELINE.md: the
reference publishes no numbers, so the baseline must be measured, not
copied.

Methodology (matched denominators): both sides time ONLY steady-state
tracking frames — the reference loop times each LK->PnP(->keyframe)
iteration; ours times the chunks enqueued after every lane reports
mode>=TRACKING (initialization chunks are excluded on both sides).
ATE parity is asserted in-band: the JSON carries Sim(3)-aligned ATE-RMSE
for ours (worst lane) and for the reference trajectory on the same
sequence, plus `ate_parity` = ate_ours <= max(1.25 * ate_ref, ate_ref
+ 0.15) (monocular scale is arbitrary — SURVEY.md quirks — so both are
scale-aligned to ground truth before comparison).

Usage: python bench.py [--frames N] [--quick] [--batches 4,8,16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _setup_jax_cache():
    import jax
    repo = os.path.dirname(os.path.abspath(__file__))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


IMAGE_SHAPE = (376, 1241)   # KITTI odometry camera 0 resolution
N_FEATURES = 1000


def make_sequence(n_frames: int, image_shape=IMAGE_SHAPE, seed: int = 0):
    """KITTI-statistics proxy street sequence (io/kitti_proxy.py): ground
    plane + facades, 1/f photographic-statistics texture, forward driving
    motion at KITTI-like speed, infinite corridor (no geometry collision) —
    VERDICT round-2 item #4's realistic-frames requirement.

    Rendered frames are cached on disk keyed by (seed, n, shape): the
    B-lane bench renders B DISTINCT scenes (seed = lane), which would
    otherwise dominate bench wall time on every run."""
    from ros2_mono_vo_tpu.io.kitti_proxy import KittiProxyScene

    rng = np.random.default_rng(seed)
    scene = KittiProxyScene(rng, image_shape=image_shape)
    poses = scene.camera_path(n_frames, speed=0.5, curve=0.12, sway=0.04)

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_cache")
    os.makedirs(cache_dir, exist_ok=True)
    key = f"seq_s{seed}_n{n_frames}_{image_shape[0]}x{image_shape[1]}_v1.npz"
    path = os.path.join(cache_dir, key)
    if os.path.exists(path):
        stack = np.load(path)["stack"]
        frames = list(stack.astype(np.float32))
    else:
        frames = [scene.render(T) for T in poses]
        np.savez_compressed(
            path, stack=np.clip(np.stack(frames), 0, 255).astype(np.uint8))
    return scene, poses, frames


def _vo_config(ba: bool = False, lc: bool = False):
    from ros2_mono_vo_tpu.config import (VOConfig, FrontendConfig,
                                         TrackerConfig, BackendConfig)
    return VOConfig(
        frontend=FrontendConfig(max_features=1024, num_pyramid_levels=8,
                                ransac_hypotheses=512, max_landmarks=16384,
                                max_keyframes=32,
                                # descriptor banks feed only LC/reloc; when
                                # off, dropping them shrinks the per-lane
                                # map ~12x and every scan-step map copy
                                # with it
                                store_descriptors=lc),
        tracker=TrackerConfig(),
        backend=BackendConfig(enable_local_ba=ba, enable_loop_closure=lc))


def _traj_ate(trajectory, poses):
    from ros2_mono_vo_tpu.io.trajectory import ate_rmse, trajectory_positions
    if len(trajectory) <= 5:
        return float("nan")
    est = trajectory_positions(trajectory)
    stamps = [int(s) for s, _ in trajectory]
    gt = np.stack([poses[i][:3, 3] for i in stamps])
    return float(ate_rmse(est, gt))


def run_ours_single(scene, frames, poses, chunk=25, ba=False):
    """Single-lane latency-mode engine; returns (fps, ate, n_timed).

    fps counts only chunks enqueued after tracking begins (matched to the
    reference loop, which times only its tracking iterations)."""
    from ros2_mono_vo_tpu.pipeline.device_vo import DeviceMonoVO

    cfg = _vo_config(ba=ba)
    stack = np.clip(np.stack(frames), 0, 255).astype(np.uint8)
    n = len(frames)

    def one_pass(seed):
        vo = DeviceMonoVO(cfg, scene.K, scene.image_shape, seed=seed,
                          chunk=chunk, sync=False)
        # async input staging — see run_ours_batched
        staged = [vo.put_chunk(stack[i:i + chunk])
                  for i in range(0, n, chunk)]
        t0 = None
        n_timed = 0
        for fdev, m in staged:
            was_tracking = vo._tracking
            vo.process_staged(fdev, m)
            if was_tracking:
                n_timed += m
            elif vo._tracking and t0 is None:
                t0 = time.perf_counter()   # steady state from next chunk on
        vo.finalize()
        elapsed = (time.perf_counter() - t0) if t0 is not None else 1e9
        return vo, elapsed, n_timed

    one_pass(seed=0)                          # compile warmup
    vo, elapsed, n_timed = one_pass(seed=1)
    ate = _traj_ate(vo.trajectory, poses)
    return (n_timed / elapsed if n_timed else 0.0), ate, n_timed


def run_ours_batched(scene, lane_data, batch: int, chunk=25,
                     prefetch_depth: int = 0):
    """B-lane aggregate engine; returns (agg_fps, worst_ate, n_timed_total,
    final VO engine for breakdown probes).

    Every lane runs its OWN distinct proxy scene (`lane_data` = per-lane
    (poses, uint8 stack); lane b uses entry b % len) — divergent content
    de-synchronizes keyframe service realistically instead of only through
    RNG seeds. Aggregate fps = B * steady-state frames / elapsed; the timed
    region starts once ALL lanes report tracking (init chunks excluded, as
    on the reference side).

    Input staging: by default every chunk is staged on device AND the
    transfers are drained BEFORE the timed region. The axon tunnel's H2D
    rate swings between ~30 MB/s and ~1.5 GB/s run to run (measured) and
    transfers serialize with compute dispatches on the tunnel — in-flight
    staging would make the headline number measure tunnel weather, not the
    chip. A production host feeds frames over PCIe DMA at tens of GB/s
    with a bounded double-buffer; `prefetch_depth > 0` reproduces that
    bounded-loader behavior (ADVICE round-4 #4) for realism runs."""
    from ros2_mono_vo_tpu.pipeline.device_vo import BatchedDeviceMonoVO
    import jax

    cfg = _vo_config(ba=True)
    stack_b = np.stack([lane_data[b % len(lane_data)][1]
                        for b in range(batch)])
    n = stack_b.shape[1]
    starts = list(range(0, n, chunk))
    depth = prefetch_depth if prefetch_depth else len(starts)

    def one_pass(seed):
        vo = BatchedDeviceMonoVO(cfg, scene.K, scene.image_shape,
                                 batch=batch, seed=seed, chunk=chunk)
        pending = [vo.put_chunk(stack_b[:, i:i + chunk])
                   for i in starts[:depth]]
        if not prefetch_depth:
            jax.block_until_ready([f for f, _ in pending])
        t0 = None
        n_timed = 0
        for k, i in enumerate(starts):
            fdev, m = pending[k]
            if k + depth < len(starts):
                j = starts[k + depth]
                pending.append(vo.put_chunk(stack_b[:, j:j + chunk]))
            was_tracking = vo._all_tracking
            vo.process_chunk(fdev, n_real=m)
            pending[k] = None              # release the staged buffer
            if was_tracking:
                n_timed += m
            elif vo._all_tracking and t0 is None:
                t0 = time.perf_counter()
        vo.finalize()
        elapsed = (time.perf_counter() - t0) if t0 is not None else 1e9
        return vo, elapsed, n_timed

    one_pass(seed=0)                          # compile warmup
    vo, elapsed, n_timed = one_pass(seed=7)
    ates = [_traj_ate(t, lane_data[b % len(lane_data)][0])
            for b, t in enumerate(vo.trajectories)]
    worst = max(ates) if ates else float("nan")
    agg = batch * n_timed / elapsed if n_timed else 0.0
    return agg, worst, batch * n_timed, vo


def run_loop_closure(scene, n_frames: int, chunk=25):
    """Loop-closure payoff on a drift-heavy out-and-back drive (reference
    roadmap 'Loop Closing', README.md:97): same engine + BA, with and
    without the closure machinery. Returns (ate_lc, ate_nolc, fps_lc,
    fps_nolc, n_closures). The LC run also applies finalize()'s
    full-trajectory pose graph — the production finishing pass.

    The drive is 2x the headline length so odometry drift accumulates well
    beyond what the window-8 BA can absorb — the regime where LC-on vs
    LC-off must separate decisively. fps timing is steady-state only
    (from the first tracked chunk), matching run_ours_single."""
    from ros2_mono_vo_tpu.pipeline.device_vo import DeviceMonoVO

    n_loop = 2 * n_frames
    poses = scene.loop_path(n_loop, speed=0.5)
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_cache")
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"loop_n{n_loop}_v1.npz")
    if os.path.exists(path):
        stack = np.load(path)["stack"]
    else:
        stack = np.clip(np.stack([scene.render(T) for T in poses]),
                        0, 255).astype(np.uint8)
        np.savez_compressed(path, stack=stack)

    def one(lc: bool, seed: int):
        cfg = _vo_config(ba=True, lc=lc)
        vo = DeviceMonoVO(cfg, scene.K, scene.image_shape, seed=seed,
                          chunk=chunk, sync=False)
        t0 = None
        n_timed = 0
        for i in range(0, n_loop, chunk):
            was_tracking = vo._tracking
            vo.process_chunk(stack[i:i + chunk])
            if was_tracking:
                n_timed += min(chunk, n_loop - i)
            elif vo._tracking and t0 is None:
                t0 = time.perf_counter()
        if t0 is not None:
            # drain the async dispatch queue INSIDE the timed region, then
            # stop the clock before finalize: the full-trajectory pose
            # graph is a once-per-run finishing pass whose edge count (and
            # so its compiled shape) varies run to run — its compile time
            # is not steady-state tracking throughput
            import jax
            jax.block_until_ready(vo.carry.pose_wc)
            elapsed = time.perf_counter() - t0
        else:
            elapsed = 1e9
        vo.finalize()
        if lc:
            vo.optimize_full_trajectory()
        ate = _traj_ate(vo.trajectory, poses)
        return ate, (n_timed / elapsed if n_timed else 0.0), \
            len(vo.loop_closures)

    one(True, seed=0)                     # compile warmup
    ate_lc, fps_lc, n_clo = one(True, seed=1)
    ate_no, fps_no, _ = one(False, seed=1)
    return ate_lc, ate_no, fps_lc, fps_no, n_clo


def run_reference_cpu(scene, frames, poses):
    """Faithful re-execution of the reference node's pipeline with OpenCV
    (the library the reference delegates all numerics to), on CPU.

    Returns (fps, n_track, ate): per-tracked-frame throughput and the
    Sim(3)-aligned ATE of the trajectory it produces — the parity anchor."""
    import cv2

    K = scene.K.astype(np.float64)
    orb = cv2.ORB_create(nfeatures=N_FEATURES)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING)
    frames8 = [np.clip(f, 0, 255).astype(np.uint8) for f in frames]

    state = "init"
    ref = None
    prev = None            # (img, pts [n,2], ids [n])
    lm_xyz = {}
    next_lm = 0
    track_count = 0
    t_track = 0.0
    n_track = 0
    last_kf = None         # (kp, desc, pose_cw, ids_by_kp)
    pose_cw = np.eye(4)
    trajectory = []        # (frame_idx, pose_wc)

    def detect(img):
        kps, desc = orb.detectAndCompute(img, None)
        return kps, desc

    def lowe_match(d1, d2):
        if d1 is None or d2 is None or len(d1) < 2 or len(d2) < 2:
            return []
        knn = bf.knnMatch(d1, d2, k=2)
        return [p[0] for p in knn if len(p) == 2
                and p[0].distance < 0.7 * p[1].distance]

    for i, img in enumerate(frames8):
        t0 = time.perf_counter()
        if state == "init":
            kps, desc = detect(img)
            if ref is None:
                ref = (img, kps, desc)
            else:
                matches = lowe_match(ref[2], desc)
                if len(matches) >= 100:
                    p1 = np.float32([ref[1][m.queryIdx].pt for m in matches])
                    p2 = np.float32([kps[m.trainIdx].pt for m in matches])
                    _, inl_h = cv2.findHomography(p1, p2, cv2.RANSAC, 1.0)
                    _, inl_f = cv2.findFundamentalMat(p1, p2, cv2.FM_RANSAC,
                                                      1.0, 0.99)
                    sh = int(inl_h.sum()) if inl_h is not None else 0
                    sf = int(inl_f.sum()) if inl_f is not None else 1
                    if sf / len(matches) >= 0.5 and sh / max(sf, 1) <= 0.56:
                        E, maskE = cv2.findEssentialMat(p1, p2, K, cv2.RANSAC,
                                                        0.99, 1.0)
                        _, R, t, maskP = cv2.recoverPose(E, p1, p2, K,
                                                         mask=maskE)
                        P1 = K @ np.eye(4)[:3]
                        T2 = np.eye(4)
                        T2[:3, :3] = R
                        T2[:3, 3] = t.ravel()
                        P2 = K @ T2[:3]
                        good = maskP.ravel().astype(bool)
                        if good.sum() >= 4:
                            X = cv2.triangulatePoints(P1, P2, p1[good].T,
                                                      p2[good].T)
                            X = (X[:3] / X[3]).T
                            ids = []
                            for x in X:
                                lm_xyz[next_lm] = x
                                ids.append(next_lm)
                                next_lm += 1
                            prev = (img, p2[good], np.array(ids))
                            pose_cw = T2
                            last_kf = (kps, desc, T2,
                                       {m.trainIdx: ids[j] for j, m in
                                        enumerate(np.array(matches)[good])})
                            state = "track"
                            trajectory.append((i, np.linalg.inv(T2)))
        else:
            # LK track (defaults, like tracker.cpp:68-69)
            p_prev = prev[1].reshape(-1, 1, 2)
            p_new, st, err = cv2.calcOpticalFlowPyrLK(prev[0], img, p_prev, None)
            keep = (st.ravel() == 1) & (err.ravel() < 30.0)
            pts = p_new.reshape(-1, 2)[keep]
            ids = prev[2][keep]
            if len(pts) < 10:
                break
            X = np.float64([lm_xyz[j] for j in ids])
            ok, rvec, tvec, inl = cv2.solvePnPRansac(
                X, pts.astype(np.float64), K, None, iterationsCount=100,
                reprojectionError=8.0, confidence=0.99)
            R, _ = cv2.Rodrigues(rvec)
            pose_cw = np.eye(4)
            pose_cw[:3, :3] = R
            pose_cw[:3, 3] = tvec.ravel()
            track_count += 1
            # keyframe policy triggers (tracker.cpp:118-136)
            rel = pose_cw @ np.linalg.inv(last_kf[2])
            need_kf = (len(pts) < 100 or track_count > 10
                       or np.linalg.norm(rel[:3, 3]) > 1.0
                       or np.degrees(np.arccos(np.clip(
                           (np.trace(rel[:3, :3]) - 1) / 2, -1, 1))) > 15)
            if need_kf:
                kps, desc = detect(img)
                matches = lowe_match(last_kf[1], desc)
                if len(matches) >= 8:
                    q1 = np.float32([last_kf[0][m.queryIdx].pt for m in matches])
                    q2 = np.float32([kps[m.trainIdx].pt for m in matches])
                    Pa = K @ last_kf[2][:3]
                    Pb = K @ pose_cw[:3]
                    Xn = cv2.triangulatePoints(Pa, Pb, q1.T, q2.T)
                    Xn = (Xn[:3] / Xn[3]).T
                    new_ids = {}
                    for j, m in enumerate(matches):
                        lid = last_kf[3].get(m.queryIdx, -1)
                        if lid < 0:
                            lm_xyz[next_lm] = Xn[j]
                            lid = next_lm
                            next_lm += 1
                        new_ids[m.trainIdx] = lid
                    pts = np.float32([kps[k].pt for k in new_ids])
                    ids = np.array(list(new_ids.values()))
                    last_kf = (kps, desc, pose_cw, new_ids)
                    track_count = 0
            prev = (img, pts, ids)
            t_track += time.perf_counter() - t0
            n_track += 1
            trajectory.append((i, np.linalg.inv(pose_cw)))
            continue
        # init frames are not counted toward tracking FPS (same as ours)
    fps = n_track / t_track if t_track > 0 else 0.0
    ate = _traj_ate([(float(s), T) for s, T in trajectory], poses)
    return fps, n_track, ate


def run_device_breakdown(scene, lane_data, batch: int, chunk=25,
                         scan_frames=10):
    """Trace-derived device-time breakdown of the steady-state batched scan
    (tools/devtime — wall clock over the tunnel is unreliable): drives the
    engine to steady state, then times the per-frame scan under three
    static configs to split {tracking, keyframe service, in-scan BA}.

    Also reports the tracking stage's effective HBM bandwidth against a
    STATIC byte model of its dominant streams (LK patch DMAs + GN-loop
    compact re-reads) — the honest utilization number for a
    bandwidth-bound pipeline (v5e HBM peak ~819 GB/s)."""
    import dataclasses
    import jax.numpy as jnp
    from tools.devtime import devtime
    from ros2_mono_vo_tpu.pipeline.device_vo import (BatchedDeviceMonoVO,
                                                     track_scan_batched)

    cfg = _vo_config(ba=True)
    stack_b = np.stack([lane_data[b % len(lane_data)][1]
                        for b in range(batch)])
    n = stack_b.shape[1]
    vo = BatchedDeviceMonoVO(cfg, scene.K, scene.image_shape, batch=batch,
                             seed=7, chunk=chunk)
    i = 0
    while not vo._all_tracking and i < n - scan_frames:
        vo.process_chunk(stack_b[:, i:i + chunk])
        i += chunk
    if not vo._all_tracking:
        return {}
    carry = vo.carry
    E = scan_frames
    fdev = jnp.asarray(stack_b[:, i:i + E])

    def scan_ms(c):
        return devtime(
            lambda cr, f: track_scan_batched(cr, f, jnp.int32(E), vo.K, c),
            carry, fdev, iters=3)

    ms_full = scan_ms(cfg)
    ms_noba = scan_ms(dataclasses.replace(
        cfg, backend=dataclasses.replace(cfg.backend, enable_local_ba=False)))
    quiet = dataclasses.replace(
        cfg, tracker=dataclasses.replace(
            cfg.tracker, min_observations_before_triangulation=0,
            max_tracking_after_keyframe=10_000,
            max_translation_from_keyframe=1e9,
            max_rotation_from_keyframe=1e9))
    ms_quiet = scan_ms(quiet)

    # static lower-bound byte model of the tracking stage's HBM streams
    # (per frame-row): LK patch DMAs, GN-loop compact re-reads + weight
    # builds (bf16, 128-lane padded), pyramid build + carry selects
    NT, it = 256, 10
    lk_bytes = 0
    for li, drift in ((0, 8), (1, 8), (2, 8), (3, 13)):
        pc = 21 + 2 * drift + 2
        lk_bytes += batch * NT * (48 + 64) * 128 * 2          # patch DMAs
        lk_bytes += batch * NT * it * (pc + 2 * 21) * 128 * 2  # GN loop
    h, w = scene.image_shape
    img_bytes = batch * 4 * int(h * w * 2 * 2.66)  # dual pyr build+select
    track_bytes = lk_bytes + img_bytes

    t_track = ms_quiet / E
    return {
        "frame_row_ms": round(ms_full / E, 3),
        "tracking_ms": round(t_track, 3),
        "service_ms": round(max(ms_noba - ms_quiet, 0.0) / E, 3),
        "ba_ms": round(max(ms_full - ms_noba, 0.0) / E, 3),
        "tracking_model_gb_per_frame_row": round(track_bytes / 1e9, 4),
        "tracking_effective_gbps": round(
            track_bytes / 1e9 / (t_track / 1e3), 1) if t_track > 0 else None,
        "hbm_peak_gbps": 819,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=150)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--batches", default="8,16")
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--no-breakdown", action="store_true")
    ap.add_argument("--prefetch-depth", type=int, default=0,
                    help="bounded staging depth (0 = stage all + drain before timing)")
    args = ap.parse_args()
    _setup_jax_cache()
    n = 30 if args.quick else args.frames
    batches = [] if args.quick else [int(b) for b in args.batches.split(",")
                                     if b.strip()]

    scene, poses, frames = make_sequence(n)
    # best of 3: host CPU contention in this container varies run to run;
    # the FASTEST reference measurement is closest to its uncontended speed
    # (taking the max is conservative for our vs_baseline ratio)
    ref_runs = [run_reference_cpu(scene, frames, poses)
                for _ in range(1 if args.quick else 3)]
    ref_fps, ref_n, ate_ref = max(ref_runs, key=lambda r: r[0])
    print(f"# reference-pipeline (OpenCV, CPU): {ref_fps:.2f} fps over "
          f"{ref_n} tracked frames, ATE {ate_ref:.3f} "
          f"(best of {len(ref_runs)})", file=sys.stderr)

    solo_fps, ate_solo, solo_n = run_ours_single(scene, frames, poses,
                                                 chunk=args.chunk, ba=True)
    print(f"# ours single-lane (local BA on): {solo_fps:.2f} fps over "
          f"{solo_n} steady-state frames, ATE {ate_solo:.3f}",
          file=sys.stderr)
    noba_fps, ate_noba, _ = run_ours_single(scene, frames, poses,
                                            chunk=args.chunk, ba=False)
    print(f"# ours single-lane (BA off):     {noba_fps:.2f} fps, "
          f"ATE {ate_noba:.3f}", file=sys.stderr)

    # per-lane DISTINCT scenes for the batched engine (lane 0 reuses the
    # headline sequence). Candidate seeds are screened with the
    # initializer's keypoint-distribution gate (reference
    # initializer.cpp:52-75, kp_distribution_thresh=0.5): a scene whose
    # occupancy never clears it leaves the node in OBTAINING_REF forever —
    # on the reference exactly as here — so such seeds are skipped, not
    # counted as engine failures.
    def _initializable(scene_s, frames_s):
        import jax.numpy as jnp
        from ros2_mono_vo_tpu.ops.features import (detect_and_describe,
                                                   occupancy_grid_check)
        cfg0 = _vo_config()
        for f in frames_s[:5]:
            feats = detect_and_describe(jnp.asarray(f, jnp.float32),
                                        cfg0.frontend)
            ok, _ = occupancy_grid_check(
                feats.uv, feats.valid, scene_s.image_shape,
                cfg0.initializer.occupancy_grid_div,
                cfg0.initializer.kp_distribution_thresh)
            if not bool(ok):
                return False
        return True

    max_b = max(batches) if batches else 0
    lane_data = [(poses, np.clip(np.stack(frames), 0, 255).astype(np.uint8))]
    s = 1
    while len(lane_data) < max_b and s < 64:
        scene_s, p_s, f_s = make_sequence(n, seed=s)
        if _initializable(scene_s, f_s):
            lane_data.append(
                (p_s, np.clip(np.stack(f_s), 0, 255).astype(np.uint8)))
        s += 1
    if max_b and len(lane_data) < max_b:
        print(f"# WARNING: only {len(lane_data)} initializable lane scenes "
              f"found; lanes will cycle", file=sys.stderr)

    best_fps, best_b, ate_batched = solo_fps, 1, ate_solo
    for b in batches:
        agg, worst_ate, n_timed, _ = run_ours_batched(
            scene, lane_data, batch=b, chunk=args.chunk,
            prefetch_depth=args.prefetch_depth)
        print(f"# ours batched B={b}: {agg:.2f} aggregate fps over "
              f"{n_timed} lane-frames (distinct scenes), worst-lane ATE "
              f"{worst_ate:.3f}", file=sys.stderr)
        if agg > best_fps and np.isfinite(worst_ate):
            best_fps, best_b, ate_batched = agg, b, worst_ate

    breakdown = {}
    if not args.quick and not args.no_breakdown and best_b > 1:
        breakdown = run_device_breakdown(scene, lane_data, batch=best_b,
                                         chunk=args.chunk)
        if breakdown:
            print(f"# device breakdown B={best_b} (ms/frame-row): "
                  f"total {breakdown['frame_row_ms']}, tracking "
                  f"{breakdown['tracking_ms']}, service "
                  f"{breakdown['service_ms']}, ba {breakdown['ba_ms']}; "
                  f"tracking streams ~{breakdown['tracking_effective_gbps']}"
                  f" GB/s of {breakdown['hbm_peak_gbps']} peak",
                  file=sys.stderr)

    # loop-closure payoff line (out-and-back drive, solo engine + BA):
    # secondary metric, skipped in --quick
    lc_extra = {}
    if not args.quick:
        ate_lc, ate_nolc, fps_lc, fps_nolc, n_clo = run_loop_closure(
            scene, n, chunk=args.chunk)
        print(f"# loop drive ({n} frames out-and-back): ATE with LC "
              f"{ate_lc:.3f} ({n_clo} closures, {fps_lc:.1f} fps) vs "
              f"without {ate_nolc:.3f} ({fps_nolc:.1f} fps)",
              file=sys.stderr)
        lc_extra = {"ate_loop_lc": round(ate_lc, 4),
                    "ate_loop_nolc": round(ate_nolc, 4),
                    "fps_loop_lc": round(fps_lc, 2),
                    "fps_loop_nolc": round(fps_nolc, 2),
                    "n_loop_closures": n_clo}

    # parity bound: scale-aligned ATE within 25% (+0.15 map-unit floor for
    # noise on short paths) of the measured reference pipeline's ATE
    bound = max(1.25 * ate_ref, ate_ref + 0.15)
    parity = bool(np.isfinite(ate_batched) and ate_batched <= bound)
    print(json.dumps({
        "metric": "vo_tracking_fps_per_chip_kitti_proxy",
        "value": round(best_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(best_fps / ref_fps, 3) if ref_fps > 0 else None,
        "batch": best_b,
        "single_lane_fps": round(solo_fps, 2),
        "single_lane_fps_noba": round(noba_fps, 2),
        "ate_ours": round(ate_batched, 4),
        "ate_solo_ba": round(ate_solo, 4),
        "ate_solo_noba": round(ate_noba, 4),
        "ate_ref": round(ate_ref, 4),
        "ate_parity": parity,
        "lane_scenes": "distinct",
        **({"device_breakdown": breakdown} if breakdown else {}),
        **lc_extra,
    }))


if __name__ == "__main__":
    main()
