"""Per-stage device timing of the batched engine at bench config/shapes:
track_scan_batched (per-frame path), the keyframe-service share (scan with
service suppressed), and batched_local_ba — at several B.

Usage: python -u tools/profile_batched_stages.py [--batches 8,16,32]
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import _vo_config, _setup_jax_cache
from tools.diag_batched_parity import cached_sequence


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,16,32")
    ap.add_argument("--frames", type=int, default=150)
    ap.add_argument("--chunk", type=int, default=25)
    args = ap.parse_args()
    _setup_jax_cache()
    import jax
    import jax.numpy as jnp
    from ros2_mono_vo_tpu.pipeline.device_vo import (
        BatchedDeviceMonoVO, track_scan_batched, batched_local_ba)

    n = args.frames
    scene, poses, stack = cached_sequence(n)
    cfg = _vo_config(ba=True)
    chunk = args.chunk

    for B in [int(b) for b in args.batches.split(",")]:
        stack_b = np.broadcast_to(stack, (B,) + stack.shape)
        vo = BatchedDeviceMonoVO(cfg, scene.K, scene.image_shape, batch=B,
                                 seed=7, chunk=chunk)
        # drive to steady state
        i = 0
        while not vo._all_tracking and i < n:
            vo.process_chunk(stack_b[:, i:i + chunk])
            i += chunk
        if not vo._all_tracking:
            print(f"B={B}: lanes never all tracked", flush=True)
            continue
        carry = vo.carry
        E = 10
        fdev = jnp.asarray(stack_b[:, i:i + E])

        def timeit(fn, reps=5):
            fn()  # compile
            jax.block_until_ready(carry.pose_wc)
            t0 = time.perf_counter()
            outs = [fn() for _ in range(reps)]
            jax.block_until_ready(outs[-1])
            return (time.perf_counter() - t0) / reps

        t_scan = timeit(lambda: track_scan_batched(
            carry, fdev, jnp.int32(E), vo.K, cfg))
        t_ba = timeit(lambda: batched_local_ba(carry, vo.K, cfg))
        # scan with the keyframe policy effectively silenced: huge
        # thresholds so kf_wanted never fires -> isolates the tracking path
        quiet = dataclasses.replace(
            cfg, tracker=dataclasses.replace(
                cfg.tracker, min_observations_before_triangulation=0,
                max_tracking_after_keyframe=10_000,
                max_translation_from_keyframe=1e9,
                max_rotation_from_keyframe=1e9))
        t_quiet = timeit(lambda: track_scan_batched(
            carry, fdev, jnp.int32(E), vo.K, quiet))
        per = t_scan / E * 1000
        print(f"B={B:3d}: scan {t_scan*1e3:7.1f} ms/{E}f "
              f"({per:6.2f} ms/frame-row), track-only "
              f"{t_quiet/E*1e3:6.2f} ms/frame-row, "
              f"service share {(t_scan-t_quiet)/E*1e3:6.2f} ms/frame-row, "
              f"BA pass {t_ba*1e3:7.1f} ms "
              f"({t_ba/E*1e3:5.1f} ms/frame-row at cadence {E})",
              flush=True)


if __name__ == "__main__":
    main()
