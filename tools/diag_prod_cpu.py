"""CPU bisect for the residual batched divergence seen in
tests/test_production_config.py (reduced-res proxy, B=4).

Usage: python -u tools/diag_prod_cpu.py [--service N] [--ba-every N]
           [--batch 4] [--chunk 26]
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from tests.test_production_config import (prod_config, N_FRAMES, CHUNK, _ate)
from ros2_mono_vo_tpu.io.kitti_proxy import KittiProxyScene
from ros2_mono_vo_tpu.pipeline.device_vo import (BatchedDeviceMonoVO,
                                                 DeviceMonoVO)


def cached_seq():
    cache = "/tmp/proxy_prod_cpu.npz"
    rng = np.random.default_rng(5)
    scene = KittiProxyScene(rng, image_shape=(188, 620))
    if os.path.exists(cache):
        z = np.load(cache)
        return scene, list(z["poses"]), z["frames"]
    poses = scene.camera_path(N_FRAMES, speed=0.5, curve=0.12, sway=0.04)
    frames = np.clip(np.stack([scene.render(T) for T in poses]),
                     0, 255).astype(np.uint8)
    np.savez(cache, poses=np.stack(poses), frames=frames)
    return scene, poses, frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--service", type=int, default=None)
    ap.add_argument("--ba-every", type=int, default=None)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=CHUNK)
    ap.add_argument("--solo", action="store_true")
    args = ap.parse_args()
    scene, poses, frames = cached_seq()
    cfg = prod_config()
    if args.service is not None:
        cfg = dataclasses.replace(cfg, frontend=dataclasses.replace(
            cfg.frontend, kf_service_lanes=args.service))
    if args.ba_every is not None:
        cfg = dataclasses.replace(cfg, backend=dataclasses.replace(
            cfg.backend, ba_every_frames=args.ba_every))

    if args.solo:
        for seed in [1 + 1000 * b for b in range(args.batch)]:
            vo = DeviceMonoVO(cfg, scene.K, scene.image_shape, seed=seed,
                              chunk=args.chunk, sync=False)
            for i in range(0, N_FRAMES, args.chunk):
                vo.process_chunk(frames[i:i + args.chunk])
            vo.finalize()
            print(f"solo seed={seed}: ATE {_ate(vo.trajectory, poses):.4f} "
                  f"({len(vo.trajectory)} poses)", flush=True)
        return

    B = args.batch
    stack = np.broadcast_to(frames, (B,) + frames.shape)
    vo = BatchedDeviceMonoVO(cfg, scene.K, scene.image_shape, batch=B,
                             seed=1, chunk=args.chunk)
    for i in range(0, N_FRAMES, args.chunk):
        vo.process_chunk(stack[:, i:i + args.chunk])
    vo.finalize()
    ates = [_ate(t, poses) if len(t) > 5 else float("nan")
            for t in vo.trajectories]
    kfs = [len(t) for t in vo.trajectories]
    print(f"B={B} chunk={args.chunk} service={args.service} "
          f"ba_every={args.ba_every}: ates="
          + " ".join(f"{a:.3f}" for a in ates)
          + f" poses={kfs}", flush=True)


if __name__ == "__main__":
    main()
