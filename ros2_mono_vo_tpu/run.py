"""CLI runner: dataset -> trajectory + metrics.

Replaces the reference's launch-file entry point
(`ros2 launch mono_vo mono_vo.launch.py`, reference launch/mono_vo.launch.py)
with a dataset-driven CLI:

  python -m ros2_mono_vo_tpu.run --dataset kitti --root /data/kitti --seq 00 \
      --out traj_kitti00.txt --metrics metrics.json [--ba-every 4]

Outputs the trajectory in TUM or KITTI format, a metrics JSON, and — when
the dataset ships ground truth — the Sim(3)-aligned ATE-RMSE.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset",
                    choices=["kitti", "tum", "euroc", "synthetic", "proxy"],
                    default="synthetic")
    ap.add_argument("--root", default=None, help="dataset root directory")
    ap.add_argument("--seq", default="00", help="KITTI sequence id")
    ap.add_argument("--frames", type=int, default=None, help="frame limit")
    ap.add_argument("--out", default=None, help="trajectory output path")
    ap.add_argument("--format", choices=["tum", "kitti"], default="tum")
    ap.add_argument("--metrics", default=None, help="metrics JSON path")
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--ba-every", type=int, default=0,
                    help="run local BA every N chunks (0 = off)")
    ap.add_argument("--params", default=None,
                    help="YAML params file (reference config/params.yaml format)")
    ap.add_argument("--checkpoint", default=None, help="save state here at end")
    ap.add_argument("--resume", default=None, help="restore state from here")
    ap.add_argument("--viz", type=int, default=0, metavar="PORT",
                    help="serve a live top-down view on this port (the "
                         "rviz-profile analog; 0 = off)")
    ap.add_argument("--viz-out", default=None,
                    help="write a final top-down snapshot (png/svg) here")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from ros2_mono_vo_tpu.config import VOConfig
    from ros2_mono_vo_tpu.pipeline.device_vo import DeviceMonoVO
    from ros2_mono_vo_tpu.io.trajectory import (write_tum, write_kitti,
                                                ate_rmse,
                                                trajectory_positions)
    from ros2_mono_vo_tpu.utils.metrics import MetricsCollector, get_logger

    log = get_logger("run")
    cfg = VOConfig()
    if args.params:
        import yaml
        with open(args.params) as f:
            cfg = VOConfig.from_params_yaml(yaml.safe_load(f))

    # --- open the sequence ---
    gt = None
    if args.dataset in ("synthetic", "proxy"):
        if args.dataset == "proxy":
            from ros2_mono_vo_tpu.io.kitti_proxy import KittiProxyScene
            scene = KittiProxyScene(np.random.default_rng(0))
        else:
            from ros2_mono_vo_tpu.io.synthetic import SyntheticScene
            scene = SyntheticScene(np.random.default_rng(0),
                                   image_shape=(376, 1232))
        n = args.frames or 100
        poses = scene.camera_path(n)
        frames_iter = ((float(i), scene.render(T))
                       for i, T in enumerate(poses))
        K = scene.K
        dist = None
        image_shape = scene.image_shape
        n_frames = n
        gt = [(float(i), T) for i, T in enumerate(poses)]
    else:
        from ros2_mono_vo_tpu.io.datasets import open_sequence
        kw = {"max_frames": args.frames} if args.frames else {}
        if args.dataset == "kitti":
            kw["sequence"] = args.seq
        ds = open_sequence(args.dataset, args.root, **kw)
        info = ds.camera_info()
        K = info.K
        dist = info.distortion
        stamp0, img0 = next(iter(ds))
        image_shape = img0.shape
        n_frames = len(ds)
        frames_iter = iter(ds)
        gt = ds.ground_truth()

    vo = DeviceMonoVO(cfg, K, image_shape, chunk=args.chunk, d=dist)
    if args.resume:
        from ros2_mono_vo_tpu.utils.checkpoint import load_checkpoint
        vo.carry, extra = load_checkpoint(args.resume, cfg, image_shape)
        vo._tracking = bool(np.asarray(vo.carry.mode) >= 2)
        log.info("resumed from %s (extra=%s)", args.resume, extra)

    viz = None
    if args.viz:
        from ros2_mono_vo_tpu.utils.viz import VizServer

        def _viz_state():
            lm = np.asarray(vo.carry.map.lm_xyz)
            lv = np.asarray(vo.carry.map.lm_valid)
            return list(vo.trajectory), lm[lv]

        viz = VizServer(_viz_state, port=args.viz)
        viz.start()
        log.info("live viz at http://127.0.0.1:%d", args.viz)

    metrics = MetricsCollector()
    stamps: list[float] = []
    buf: list[np.ndarray] = []
    t_start = time.perf_counter()
    chunk_i = 0
    for stamp, img in frames_iter:
        stamps.append(stamp)
        buf.append(img)
        if len(buf) == args.chunk:
            metrics.start("chunk")
            outs = vo.process_chunk(np.stack(buf))
            metrics.stop("chunk")
            metrics.record_step(outs)
            buf.clear()
            chunk_i += 1
            if args.ba_every and chunk_i % args.ba_every == 0:
                vo.run_local_ba()
    if buf:
        outs = vo.process_chunk(np.stack(buf))
        metrics.record_step(outs)
    elapsed = time.perf_counter() - t_start

    # re-stamp trajectory with dataset stamps
    traj = [(stamps[int(i)], T) for i, T in vo.trajectory]
    summary = metrics.summary()
    summary["fps"] = n_frames / elapsed
    summary["n_poses"] = len(traj)

    if gt and len(traj) > 5:
        est = trajectory_positions(traj)
        gt_map = dict((round(s, 6), T) for s, T in gt)
        pairs = [(est[k], gt_map[round(s, 6)][:3, 3])
                 for k, (s, _) in enumerate(traj) if round(s, 6) in gt_map]
        if len(pairs) > 5:
            e = np.stack([p[0] for p in pairs])
            g = np.stack([p[1] for p in pairs])
            summary["ate_rmse"] = ate_rmse(e, g)

    if args.out:
        (write_tum if args.format == "tum" else write_kitti)(args.out, traj)
        log.info("trajectory written to %s", args.out)
    if args.metrics:
        with open(args.metrics, "w") as f:
            json.dump(summary, f, indent=2)
    if args.checkpoint:
        from ros2_mono_vo_tpu.utils.checkpoint import save_checkpoint
        save_checkpoint(args.checkpoint, vo.carry, cfg, image_shape,
                        extra={"n_frames": n_frames})

    if args.viz_out:
        from ros2_mono_vo_tpu.utils.viz import render_topdown
        lm = np.asarray(vo.carry.map.lm_xyz)
        lv = np.asarray(vo.carry.map.lm_valid)
        render_topdown(traj, lm[lv], path=args.viz_out)
        log.info("snapshot written to %s", args.viz_out)
    if viz is not None:
        viz.stop()

    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
