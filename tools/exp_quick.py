"""Quick perf/ATE experiment loop: solo + batched engine on the cached
KITTI-proxy sequence, no reference re-run (uses the recorded ate_ref).

Usage: python -u tools/exp_quick.py [--batch 8] [--frames 150] [--solo-only]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import _vo_config, _setup_jax_cache, _traj_ate
from tools.diag_batched_parity import cached_sequence

ATE_REF = 2.605   # measured reference-pipeline ATE on this scene (BENCH_r03)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=150)
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--solo-only", action="store_true")
    ap.add_argument("--no-ba", action="store_true")
    args = ap.parse_args()
    _setup_jax_cache()
    import jax
    import jax.numpy as jnp
    from ros2_mono_vo_tpu.pipeline.device_vo import (DeviceMonoVO,
                                                     BatchedDeviceMonoVO)

    n = args.frames
    scene, poses, stack = cached_sequence(n)
    cfg = _vo_config(ba=not args.no_ba)

    def solo(seed):
        vo = DeviceMonoVO(cfg, scene.K, scene.image_shape, seed=seed,
                          chunk=args.chunk, sync=False)
        staged = [vo.put_chunk(stack[i:i + args.chunk])
                  for i in range(0, n, args.chunk)]
        t0, n_timed = None, 0
        for fdev, m in staged:
            was = vo._tracking
            vo.process_staged(fdev, m)
            if was:
                n_timed += m
            elif vo._tracking and t0 is None:
                t0 = time.perf_counter()
        vo.finalize()
        el = (time.perf_counter() - t0) if t0 else 1e9
        return vo, el, n_timed

    solo(0)
    vo, el, n_timed = solo(1)
    ate = _traj_ate(vo.trajectory, poses)
    print(f"solo: {n_timed / el:7.2f} fps  ATE {ate:.3f} "
          f"(ref {ATE_REF}, bound {max(1.25 * ATE_REF, ATE_REF + 0.15):.2f})",
          flush=True)

    if args.solo_only:
        return

    B = args.batch
    stack_b = np.broadcast_to(stack, (B,) + stack.shape)

    def batched(seed):
        vo = BatchedDeviceMonoVO(cfg, scene.K, scene.image_shape, batch=B,
                                 seed=seed, chunk=args.chunk)
        staged = [vo.put_chunk(stack_b[:, i:i + args.chunk])
                  for i in range(0, n, args.chunk)]
        t0, n_timed = None, 0
        for fdev, m in staged:
            was = vo._all_tracking
            vo.process_chunk(fdev, n_real=m)
            if was:
                n_timed += m
            elif vo._all_tracking and t0 is None:
                t0 = time.perf_counter()
        vo.finalize()
        el = (time.perf_counter() - t0) if t0 else 1e9
        return vo, el, n_timed

    batched(0)
    vo, el, n_timed = batched(7)
    ates = [_traj_ate(t, poses) for t in vo.trajectories]
    worst = max(ates)
    print(f"B={B}: {B * n_timed / el:7.2f} agg fps  worst ATE {worst:.3f} "
          f"mean {np.mean(ates):.3f} "
          f"({n_timed} timed frames/lane)", flush=True)


if __name__ == "__main__":
    main()
