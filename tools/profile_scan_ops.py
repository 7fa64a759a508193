"""Op-level device-time breakdown of the REAL steady-state batched scan.

Drives the engine to steady state on the bench scene (so the carry, map
occupancy, and branch behavior match production), then measures
track_scan_batched under the profiler trace and prints the top HLO ops.

Usage: python -u tools/profile_scan_ops.py [--batch 8] [--chunk 10] [--top 30]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import _vo_config, _setup_jax_cache
from tools.diag_batched_parity import cached_sequence


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--scan-frames", type=int, default=10)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--no-ba", action="store_true")
    args = ap.parse_args()
    _setup_jax_cache()
    import jax
    import jax.numpy as jnp
    from tools.devtime import devtime
    from ros2_mono_vo_tpu.pipeline.device_vo import (BatchedDeviceMonoVO,
                                                     track_scan_batched)

    n = 150
    scene, poses, stack = cached_sequence(n)
    cfg = _vo_config(ba=not args.no_ba)
    B = args.batch
    stack_b = np.broadcast_to(stack, (B,) + stack.shape)
    vo = BatchedDeviceMonoVO(cfg, scene.K, scene.image_shape, batch=B,
                             seed=7, chunk=args.chunk)
    i = 0
    while not vo._all_tracking and i < n:
        vo.process_chunk(stack_b[:, i:i + args.chunk])
        i += args.chunk
    assert vo._all_tracking, "lanes never reached steady state"
    carry = vo.carry
    E = args.scan_frames
    fdev = jnp.asarray(stack_b[:, i:i + E])

    ms, ops = devtime(
        lambda c, f: track_scan_batched(c, f, jnp.int32(E), vo.K, cfg),
        carry, fdev, top=args.top, iters=5)
    print(f"B={B} scan[{E}f]: {ms:.1f} ms device "
          f"({ms / E:.2f} ms/frame-row, {ms / E / B:.3f} ms/lane-frame, "
          f"agg {1000 * B * E / ms:.1f} fps)", flush=True)
    for op, t in ops:
        print(f"  {t / 5:9.3f} ms  {op[:110]}")


if __name__ == "__main__":
    main()
