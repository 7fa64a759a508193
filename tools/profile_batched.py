"""Aggregate frames/s/chip of the batched VO engine at several lane counts.

The north-star metric (BASELINE.json) is aggregate frames/s/chip on
KITTI-sized input; lanes share compiled graphs and the MXU, so throughput
should grow superlinearly in B while the chip is latency-bound.

Usage: python -u tools/profile_batched.py [--frames 64] [--batches 1,4,8,16]
"""
import argparse
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from ros2_mono_vo_tpu.config import VOConfig, FrontendConfig, TrackerConfig
from ros2_mono_vo_tpu.io.synthetic import SyntheticScene
from ros2_mono_vo_tpu.pipeline.device_vo import BatchedDeviceMonoVO


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--batches", default="1,4,8,16")
    ap.add_argument("--chunk", type=int, default=16)
    args = ap.parse_args()

    cfg = VOConfig(
        frontend=FrontendConfig(max_features=1024, num_pyramid_levels=8,
                                ransac_hypotheses=512, max_landmarks=16384,
                                max_keyframes=32),
        tracker=TrackerConfig())
    rng = np.random.default_rng(0)
    scene = SyntheticScene(rng, image_shape=(376, 1232),
                           depths=(10.0, 18.0, 32.0),
                           extents=(9.0, 17.0, 36.0), tex_size=1024)
    n = args.frames
    poses = scene.camera_path(n, step=0.12, lateral=0.02)
    frames = np.clip(np.stack([scene.render(T) for T in poses]),
                     0, 255).astype(np.uint8)
    print(f"frames rendered: {n}", flush=True)

    for B in [int(b) for b in args.batches.split(",")]:
        stack = np.broadcast_to(frames, (B,) + frames.shape)

        def one_pass(seed):
            vo = BatchedDeviceMonoVO(cfg, scene.K, scene.image_shape,
                                     batch=B, seed=seed, chunk=args.chunk)
            t0 = time.perf_counter()
            for i in range(0, n, args.chunk):
                vo.process_chunk(stack[:, i:i + args.chunk])
            vo.finalize()
            return vo, time.perf_counter() - t0

        t_c0 = time.perf_counter()
        one_pass(seed=0)   # compile warmup
        t_compile = time.perf_counter() - t_c0
        vo, elapsed = one_pass(seed=1)
        agg = B * n / elapsed
        npose = [len(t) for t in vo.trajectories]
        print(f"B={B:3d}: {agg:9.1f} agg fps  ({elapsed*1000/n:7.2f} ms/frame-step)"
              f"  compile+first {t_compile:6.1f}s  poses/lane {npose[:4]}",
              flush=True)


if __name__ == "__main__":
    main()
