"""Stage-by-stage accuracy diff: our kernels vs OpenCV vs exact ground truth.

Runs on the bench scene (same geometry as bench.py) and reports, per stage,
median/p90 error against the synthetic scene's exact ray-cast ground truth —
for OUR kernel and for the OpenCV call the reference delegates to:

  lk      endpoint error of LK flow vs GT flow (raycast + reproject)
  pnp     pose error of PnP-RANSAC on identical (3D, 2D) inputs
  match   fraction of Lowe-ratio matches that are geometrically correct
  tri     two-view triangulation point error on identical correspondences
  e2e     per-frame trajectory error growth of the full engine vs reference

Usage: python tools/oracle_diff.py [--stage lk,pnp,match,tri,e2e] [--frames N]
       [--tpu]   (default: CPU — numerics are platform-independent except
                  approx_max_k; pass --tpu to measure the bench platform)
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pct(x, q):
    x = np.asarray(x, np.float64)
    x = x[np.isfinite(x)]
    return float(np.percentile(x, q)) if len(x) else float("nan")


def report(name, ours, cv, unit="px"):
    print(f"{name:28s} ours med={pct(ours,50):8.4f} p90={pct(ours,90):8.4f} "
          f"| opencv med={pct(cv,50):8.4f} p90={pct(cv,90):8.4f} [{unit}]"
          f" n={len(np.asarray(ours)[np.isfinite(ours)])}/{len(np.asarray(cv)[np.isfinite(cv)])}")


def make_scene(n_frames):
    from bench import make_sequence
    return make_sequence(n_frames)


def gt_flow(scene, T_a, T_b, uv_a):
    """Exact flow a->b for pixels uv_a via raycast + reprojection."""
    xyz, ok = scene.raycast(T_a, uv_a)
    T_cw_b = np.linalg.inv(T_b)
    pc = xyz @ T_cw_b[:3, :3].T + T_cw_b[:3, 3]
    z = pc[:, 2]
    uv_b = (pc @ scene.K.T.astype(np.float64))
    uv_b = uv_b[:, :2] / uv_b[:, 2:3]
    return uv_b, ok & (z > 0.1)


def stage_lk(scene, poses, frames, n_pairs=8):
    import cv2
    import jax.numpy as jnp
    from ros2_mono_vo_tpu.ops.lk import build_lk_pyramid, lk_track

    ours_e, cv_e = [], []
    H, W = scene.image_shape
    for i in range(0, n_pairs * 4, 4):
        a = np.clip(frames[i], 0, 255).astype(np.uint8)
        b = np.clip(frames[i + 1], 0, 255).astype(np.uint8)
        pts = cv2.goodFeaturesToTrack(a, 400, 0.01, 12)
        if pts is None:
            continue
        uv = pts.reshape(-1, 2).astype(np.float32)
        gt, ok = gt_flow(scene, poses[i], poses[i + 1], uv.astype(np.float64))
        inb = ok & (gt[:, 0] > 15) & (gt[:, 0] < W - 15) & \
            (gt[:, 1] > 15) & (gt[:, 1] < H - 15)

        # OpenCV
        p1, st, err = cv2.calcOpticalFlowPyrLK(a, b, uv.reshape(-1, 1, 2), None)
        p1 = p1.reshape(-1, 2)
        keep_cv = (st.ravel() == 1) & inb
        cv_e.extend(np.linalg.norm(p1 - gt, axis=1)[keep_cv])

        # ours (pad to slot capacity)
        N = 512
        uvp = np.zeros((N, 2), np.float32)
        uvp[:len(uv)] = uv
        vm = np.zeros(N, bool)
        vm[:len(uv)] = True
        pyr_a = build_lk_pyramid(jnp.asarray(a, jnp.float32), 4)
        pyr_b = build_lk_pyramid(jnp.asarray(b, jnp.float32), 4)
        fl = lk_track(pyr_a, pyr_b, jnp.asarray(uvp), jnp.asarray(vm))
        fuv = np.asarray(fl.uv)[:len(uv)]
        fst = np.asarray(fl.status)[:len(uv)]
        keep = fst & inb
        ours_e.extend(np.linalg.norm(fuv - gt, axis=1)[keep])
    report("LK endpoint vs GT", ours_e, cv_e)


def stage_pnp(scene, poses, frames, n_trials=12, noise=0.5):
    import cv2
    import jax
    import jax.numpy as jnp
    from ros2_mono_vo_tpu.ops.ransac import solve_pnp_ransac
    from ros2_mono_vo_tpu.geometry.se3 import se3_inverse

    rng = np.random.default_rng(3)
    K = scene.K.astype(np.float64)
    H, W = scene.image_shape
    ours_r, ours_t, cv_r, cv_t = [], [], [], []
    for trial in range(n_trials):
        i = (10 + trial * 5) % len(poses)
        T_wc = poses[i]
        T_cw = np.linalg.inv(T_wc)
        # sample pixels, raycast GT 3D, project to get exact 2D, add noise
        uv = np.stack([rng.uniform(20, W - 20, 300),
                       rng.uniform(20, H - 20, 300)], -1)
        xyz, ok = scene.raycast(T_wc, uv)
        uv_n = uv + rng.normal(0, noise, uv.shape)
        # 10% outliers
        out_m = rng.uniform(size=len(uv)) < 0.1
        uv_n[out_m] += rng.uniform(-80, 80, (out_m.sum(), 2))
        xyz, uv_n, okm = xyz[ok], uv_n[ok], ok[ok]

        ok2, rvec, tvec, inl = cv2.solvePnPRansac(
            xyz, uv_n, K, None, iterationsCount=100,
            reprojectionError=8.0, confidence=0.99)
        Rcv, _ = cv2.Rodrigues(rvec)
        cv_r.append(np.degrees(np.arccos(np.clip(
            (np.trace(Rcv.T @ T_cw[:3, :3]) - 1) / 2, -1, 1))))
        cv_t.append(np.linalg.norm(tvec.ravel() - T_cw[:3, 3]))

        N = 512
        Xp = np.zeros((N, 3), np.float32)
        Up = np.zeros((N, 2), np.float32)
        Vp = np.zeros(N, bool)
        Xp[:len(xyz)] = xyz
        Up[:len(xyz)] = uv_n
        Vp[:len(xyz)] = True
        res = solve_pnp_ransac(jnp.asarray(scene.K), jnp.asarray(Xp),
                               jnp.asarray(Up), jnp.asarray(Vp), 8.0,
                               jax.random.PRNGKey(trial), num_hypotheses=128,
                               refine_iters=10)
        T_est = np.asarray(res.model, np.float64)
        ours_r.append(np.degrees(np.arccos(np.clip(
            (np.trace(T_est[:3, :3].T @ T_cw[:3, :3]) - 1) / 2, -1, 1))))
        ours_t.append(np.linalg.norm(T_est[:3, 3] - T_cw[:3, 3]))
    report("PnP rot err vs GT", ours_r, cv_r, "deg")
    report("PnP trans err vs GT", ours_t, cv_t, "m")


def stage_match(scene, poses, frames, n_pairs=6, gap=3):
    """Detect+describe+Lowe-match between frames i and i+gap; a match is
    'correct' if the matched point lies within 3 px of the GT-flowed point."""
    import cv2
    import jax.numpy as jnp
    from ros2_mono_vo_tpu.config import FrontendConfig
    from ros2_mono_vo_tpu.ops.features import detect_and_describe
    from ros2_mono_vo_tpu.ops.matching import match_descriptors

    fcfg = FrontendConfig(max_features=1024)
    orb = cv2.ORB_create(nfeatures=1000)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING)
    ours_prec, cv_prec, ours_n, cv_n = [], [], [], []
    for p in range(n_pairs):
        i = p * 10
        a = np.clip(frames[i], 0, 255).astype(np.uint8)
        b = np.clip(frames[i + gap], 0, 255).astype(np.uint8)

        kpa, da = orb.detectAndCompute(a, None)
        kpb, db = orb.detectAndCompute(b, None)
        knn = bf.knnMatch(da, db, k=2)
        good = [m[0] for m in knn if len(m) == 2
                and m[0].distance < 0.7 * m[1].distance]
        pa = np.float64([kpa[m.queryIdx].pt for m in good])
        pb = np.float64([kpb[m.trainIdx].pt for m in good])
        gt, ok = gt_flow(scene, poses[i], poses[i + gap], pa)
        corr = ok & (np.linalg.norm(pb - gt, axis=1) < 3.0)
        cv_prec.append(corr.sum() / max(len(good), 1))
        cv_n.append(len(good))

        fa = detect_and_describe(jnp.asarray(a, jnp.float32), fcfg)
        fb = detect_and_describe(jnp.asarray(b, jnp.float32), fcfg)
        mm = match_descriptors(fa.desc, fa.valid, fb.desc, fb.valid, 0.7)
        mv = np.asarray(mm.valid)
        qa = np.asarray(fa.uv)[mv]
        qb = np.asarray(fb.uv)[np.asarray(mm.idx)[mv]]
        gt2, ok2 = gt_flow(scene, poses[i], poses[i + gap],
                           qa.astype(np.float64))
        corr2 = ok2 & (np.linalg.norm(qb - gt2, axis=1) < 3.0)
        ours_prec.append(corr2.sum() / max(mv.sum(), 1))
        ours_n.append(int(mv.sum()))
    print(f"{'match precision @3px':28s} ours med={pct(ours_prec,50):8.4f} "
          f"n_med={pct(ours_n,50):6.0f} | opencv med={pct(cv_prec,50):8.4f} "
          f"n_med={pct(cv_n,50):6.0f}")


def stage_tri(scene, poses, frames, n_pairs=6, gap=8, noise=0.4):
    import cv2
    import jax.numpy as jnp
    from ros2_mono_vo_tpu.geometry.triangulation import triangulate_and_filter

    rng = np.random.default_rng(5)
    K = scene.K.astype(np.float64)
    H, W = scene.image_shape
    ours_e, cv_e = [], []
    for p in range(n_pairs):
        i = p * 8
        T_a, T_b = poses[i], poses[i + gap]
        uv_a = np.stack([rng.uniform(20, W - 20, 256),
                         rng.uniform(20, H - 20, 256)], -1)
        xyz, ok = scene.raycast(T_a, uv_a)
        uv_b, ok2 = gt_flow(scene, poses[i], poses[i + gap], uv_a)
        ok = ok & ok2 & (uv_b[:, 0] > 5) & (uv_b[:, 0] < W - 5) \
            & (uv_b[:, 1] > 5) & (uv_b[:, 1] < H - 5)
        ua = (uv_a + rng.normal(0, noise, uv_a.shape))[ok]
        ub = (uv_b + rng.normal(0, noise, uv_b.shape))[ok]
        X_gt = xyz[ok]
        T_cw_a, T_cw_b = np.linalg.inv(T_a), np.linalg.inv(T_b)
        Pa, Pb = K @ T_cw_a[:3], K @ T_cw_b[:3]
        Xh = cv2.triangulatePoints(Pa, Pb, ua.T, ub.T)
        Xcv = (Xh[:3] / Xh[3]).T
        cv_e.extend(np.linalg.norm(Xcv - X_gt, axis=1))

        N = 256
        pad = lambda x: np.pad(x.astype(np.float32),
                               ((0, N - len(x)), (0, 0)))
        vm = np.zeros(N, bool)
        vm[:len(ua)] = True
        pts, keep = triangulate_and_filter(
            jnp.asarray(scene.K), jnp.asarray(T_cw_a, jnp.float32),
            jnp.asarray(T_cw_b, jnp.float32), jnp.asarray(pad(ua)),
            jnp.asarray(pad(ub)), jnp.asarray(vm))
        pts = np.asarray(pts)[:len(ua)]
        kp = np.asarray(keep)[:len(ua)]
        ours_e.extend(np.linalg.norm(pts[kp] - X_gt[kp], axis=1))
    report("triangulation err vs GT", ours_e, cv_e, "m")


def stage_e2e(scene, poses, frames):
    """Per-frame trajectory error (Sim3-aligned) of the full engine."""
    from bench import run_reference_cpu, _vo_config
    from ros2_mono_vo_tpu.pipeline.device_vo import DeviceMonoVO
    from ros2_mono_vo_tpu.io.trajectory import umeyama_alignment

    cfg = _vo_config()
    stack = np.clip(np.stack(frames), 0, 255).astype(np.uint8)
    vo = DeviceMonoVO(cfg, scene.K, scene.image_shape, seed=1, chunk=25,
                      sync=False)
    for i in range(0, len(frames), 25):
        vo.process_chunk(stack[i:i + 25])
    vo.finalize()

    def per_frame(traj):
        stamps = [int(s) for s, _ in traj]
        est = np.stack([T[:3, 3] for _, T in traj])
        gt = np.stack([poses[i][:3, 3] for i in stamps])
        s, R, t = umeyama_alignment(est, gt)
        al = s * est @ R.T + t
        return stamps, np.linalg.norm(al - gt, axis=1)

    st_o, e_o = per_frame(vo.trajectory)
    print("ours per-frame err:", " ".join(
        f"{s}:{e:.3f}" for s, e in zip(st_o[::10], e_o[::10])))
    kf_frames = [s for s, _ in vo.trajectory]
    print(f"ours: {len(st_o)} poses, final={e_o[-1]:.3f} "
          f"rmse={np.sqrt(np.mean(e_o**2)):.3f}")

    _, _, ate_ref = run_reference_cpu(scene, frames, poses)
    print(f"reference ATE: {ate_ref:.4f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="lk,pnp,match,tri")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()
    if not args.tpu:
        # the image's sitecustomize imports jax and latches JAX_PLATFORMS=axon
        # at interpreter start; only jax.config wins before backend init
        import jax
        jax.config.update("jax_platforms", "cpu")
    scene, poses, frames = make_scene(args.frames)
    stages = args.stage.split(",")
    if "lk" in stages:
        stage_lk(scene, poses, frames)
    if "pnp" in stages:
        stage_pnp(scene, poses, frames)
    if "match" in stages:
        stage_match(scene, poses, frames)
    if "tri" in stages:
        stage_tri(scene, poses, frames)
    if "e2e" in stages:
        stage_e2e(scene, poses, frames)


if __name__ == "__main__":
    main()
