"""Benchmark: VO frames/s on a KITTI-sized synthetic sequence.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}

`value` is this framework's steady-state tracking throughput on the current
JAX default device (the real TPU chip under the driver). `vs_baseline` is
measured against a faithful CPU re-execution of the reference pipeline
(ros2_mono_vo's exact OpenCV calls + parameters: ORB-1000 detect,
BFMatcher-Hamming kNN + Lowe 0.7, calcOpticalFlowPyrLK defaults,
solvePnPRansac(100, 8.0, .99), H/F model-selection RANSAC, triangulation —
see SURVEY.md section 2 kernel table). BASELINE.md: the reference publishes
no numbers, so the baseline must be measured, not copied.

Usage: python bench.py [--frames N] [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _setup_jax_cache():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


IMAGE_SHAPE = (376, 1232)   # KITTI odometry camera 0 scale
N_FEATURES = 1000


def make_sequence(n_frames: int, image_shape=IMAGE_SHAPE, seed: int = 0):
    from ros2_mono_vo_tpu.io.synthetic import SyntheticScene

    rng = np.random.default_rng(seed)
    scene = SyntheticScene(rng, image_shape=image_shape,
                          depths=(10.0, 18.0, 32.0),
                          extents=(9.0, 17.0, 36.0), tex_size=1024)
    poses = scene.camera_path(n_frames, step=0.12, lateral=0.02)
    frames = [scene.render(T) for T in poses]
    return scene, poses, frames


def run_ours(scene, frames, poses, chunk=25):
    """Our engine (fused on-device scan); returns (fps, ate, n_frames)."""
    import jax
    from ros2_mono_vo_tpu.config import (VOConfig, FrontendConfig,
                                         TrackerConfig)
    from ros2_mono_vo_tpu.pipeline.device_vo import DeviceMonoVO
    from ros2_mono_vo_tpu.io.trajectory import ate_rmse, trajectory_positions

    cfg = VOConfig(
        frontend=FrontendConfig(max_features=1024, num_pyramid_levels=8,
                                ransac_hypotheses=512, max_landmarks=16384,
                                max_keyframes=32),
        tracker=TrackerConfig())
    # uint8 is the camera wire format (and what the reference pipeline
    # consumes); frames are cast to f32 on device inside the scan.
    stack = np.clip(np.stack(frames), 0, 255).astype(np.uint8)
    n = len(frames)

    def one_pass(seed, timed):
        # sync=False: steady-state chunks are enqueued without host syncs;
        # transfers overlap device compute. finalize() drains results and is
        # inside the timed region.
        vo = DeviceMonoVO(cfg, scene.K, scene.image_shape, seed=seed,
                          chunk=chunk, sync=False)
        t0 = time.perf_counter()
        for i in range(0, n, chunk):
            vo.process_chunk(stack[i:i + chunk])
        vo.finalize()
        return vo, time.perf_counter() - t0

    one_pass(seed=0, timed=False)          # compile warmup
    vo, elapsed = one_pass(seed=1, timed=True)

    est = trajectory_positions(vo.trajectory)
    stamps = [int(s) for s, _ in vo.trajectory]
    gt = np.stack([poses[i][:3, 3] for i in stamps])
    ate = ate_rmse(est, gt) if len(est) > 5 else float("nan")
    return n / elapsed, ate, n


def run_reference_cpu(scene, frames, poses):
    """Faithful re-execution of the reference node's pipeline with OpenCV
    (the library the reference delegates all numerics to), on CPU."""
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
    n_init_frames = 0
    last_kf = None         # (kp, desc, pose_cw, ids_by_kp)
    pose_cw = np.eye(4)

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
            n_init_frames += 1
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
            continue
        # init frames are not counted toward tracking FPS (same as ours)
    fps = n_track / t_track if t_track > 0 else 0.0
    return fps, n_track


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    _setup_jax_cache()
    n = 30 if args.quick else args.frames

    scene, poses, frames = make_sequence(n)
    ref_fps, ref_n = run_reference_cpu(scene, frames, poses)
    print(f"# reference-pipeline (OpenCV, CPU): {ref_fps:.2f} fps "
          f"over {ref_n} tracked frames", file=sys.stderr)
    ours_fps, ate, ours_n = run_ours(scene, frames, poses)
    print(f"# ours: {ours_fps:.2f} fps over {ours_n} tracked frames, "
          f"ATE {ate:.3f}", file=sys.stderr)

    print(json.dumps({
        "metric": "vo_tracking_fps_kitti_sized_synthetic",
        "value": round(ours_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(ours_fps / ref_fps, 3) if ref_fps > 0 else None,
    }))


if __name__ == "__main__":
    main()
