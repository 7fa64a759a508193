"""Diagnose batched-vs-solo ATE divergence (VERDICT round-3 item #1).

Runs the bench scene through (a) solo DeviceMonoVO with local BA for each
of the batched bench's lane seeds, and (b) BatchedDeviceMonoVO, then
prints per-seed / per-lane ATE side by side. If solo also blows up on some
seeds, the divergence is stochastic robustness; if solo is uniformly good
while lanes diverge, it is batched-engine semantics.

Usage: python -u tools/diag_batched_parity.py [--frames 150] [--batch 8]
           [--chunk 25] [--service N] [--skip-solo]
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import _vo_config, _traj_ate, _setup_jax_cache


def cached_sequence(n):
    """Render once, cache frames+poses to /tmp (the proxy render is
    minutes of host time for 150 frames)."""
    cache = f"/tmp/kitti_proxy_{n}.npz"
    from ros2_mono_vo_tpu.io.kitti_proxy import KittiProxyScene
    rng = np.random.default_rng(0)
    scene = KittiProxyScene(rng, image_shape=(376, 1241))
    if os.path.exists(cache):
        z = np.load(cache)
        return scene, list(z["poses"]), z["stack"]
    poses = scene.camera_path(n, speed=0.5, curve=0.12, sway=0.04)
    frames = [scene.render(T) for T in poses]
    stack = np.clip(np.stack(frames), 0, 255).astype(np.uint8)
    np.savez(cache, poses=np.stack(poses), stack=stack)
    return scene, poses, stack


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=150)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--service", type=int, default=None,
                    help="override frontend.kf_service_lanes")
    ap.add_argument("--skip-solo", action="store_true")
    args = ap.parse_args()
    _setup_jax_cache()
    n = args.frames
    scene, poses, stack = cached_sequence(n)
    cfg = _vo_config(ba=True)
    if args.service is not None:
        cfg = dataclasses.replace(
            cfg, frontend=dataclasses.replace(cfg.frontend,
                                              kf_service_lanes=args.service))
    chunk = args.chunk

    from ros2_mono_vo_tpu.pipeline.device_vo import (DeviceMonoVO,
                                                     BatchedDeviceMonoVO)

    batch, seed0 = args.batch, 7
    lane_seeds = [seed0 + 1000 * b for b in range(batch)]

    if not args.skip_solo:
        for seed in lane_seeds:
            vo = DeviceMonoVO(cfg, scene.K, scene.image_shape, seed=seed,
                              chunk=chunk, sync=False)
            for i in range(0, n, chunk):
                vo.process_chunk(stack[i:i + chunk])
            vo.finalize()
            ate = _traj_ate(vo.trajectory, poses)
            print(f"solo seed={seed:5d}: ATE {ate:.4f}  "
                  f"({len(vo.trajectory)} poses)", flush=True)

    vo = BatchedDeviceMonoVO(cfg, scene.K, scene.image_shape, batch=batch,
                             seed=seed0, chunk=chunk)
    stack_b = np.broadcast_to(stack, (batch,) + stack.shape)
    for i in range(0, n, chunk):
        vo.process_chunk(stack_b[:, i:i + chunk])
    vo.finalize()
    ates = []
    for b in range(batch):
        ate = _traj_ate(vo.trajectories[b], poses)
        ates.append(ate)
        print(f"lane b={b} (seed={lane_seeds[b]:5d}): ATE {ate:.4f}  "
              f"({len(vo.trajectories[b])} poses)", flush=True)
    print(f"batch={batch} chunk={chunk} service={args.service}: "
          f"worst {max(ates):.4f} mean {np.mean(ates):.4f}", flush=True)


if __name__ == "__main__":
    main()
