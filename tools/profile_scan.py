"""Trace-derived device time of the production scan graphs.

Measures the steady-state engines the bench runs: single-lane track_scan
(chunk C) and track_scan_batched (B lanes x chunk C) — per-frame and
per-frame-per-lane device cost, the numbers that set aggregate frames/s/chip.

Usage: python -u tools/profile_scan.py [--chunk 16] [--batches 1,8,16]
"""
import argparse
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tools.devtime import devtime
from ros2_mono_vo_tpu.config import VOConfig, FrontendConfig, TrackerConfig
from ros2_mono_vo_tpu.pipeline.device_vo import (init_carry, track_scan,
                                                 track_scan_batched,
                                                 MODE_TRACKING)
from ros2_mono_vo_tpu.pipeline.state import FrameObs

H, W = 376, 1232


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--batches", default="1,8,16")
    ap.add_argument("--top", type=int, default=0)
    args = ap.parse_args()

    cfg = VOConfig(
        frontend=FrontendConfig(max_features=1024, num_pyramid_levels=8,
                                ransac_hypotheses=512, max_landmarks=16384,
                                max_keyframes=32),
        tracker=TrackerConfig())
    fcfg = cfg.frontend
    rng = np.random.default_rng(0)
    C = args.chunk
    K = jnp.asarray([[718.0, 0, W / 2], [0, 718.0, H / 2], [0, 0, 1]],
                    jnp.float32)
    frames = jnp.asarray(
        rng.uniform(0, 255, (C, H, W)).astype(np.float32))
    N = fcfg.max_features
    L = fcfg.max_landmarks

    def tracking_carry(seed):
        c = init_carry(cfg, (H, W), seed)
        m = c.map._replace(
            lm_xyz=jnp.asarray(rng.uniform(-5, 5, (L, 3)).astype(np.float32)
                               + np.array([0, 0, 12], np.float32)),
            lm_valid=jnp.ones((L,), bool),
            lm_count=jnp.int32(L),
            kf_count=jnp.int32(1),
            kf_valid=c.map.kf_valid.at[0].set(True),
            kf_obs_valid=c.map.kf_obs_valid.at[0].set(True),
            last_kf_desc_valid=jnp.ones((N,), bool))
        nt = min(fcfg.max_track_points, fcfg.max_features)
        uv = jnp.asarray(rng.uniform(30, 300, (nt, 2)).astype(np.float32))
        lm_id = jnp.arange(nt, dtype=jnp.int32)
        return c._replace(
            mode=jnp.int32(MODE_TRACKING), map=m,
            prev_obs=FrameObs(uv=uv, lm_id=lm_id,
                              valid=jnp.ones((nt,), bool)))

    c1 = tracking_carry(0)
    out = devtime(lambda c: track_scan(c, frames, jnp.int32(C), K, cfg),
                  c1, top=args.top)
    if args.top:
        ms, ops = out
    else:
        ms, ops = out, None
    print(f"track_scan        C={C}: {ms:8.2f} ms/chunk "
          f"{ms / C:6.2f} ms/frame -> {1000 * C / ms:7.1f} fps single-lane",
          flush=True)
    if ops:
        for op, t in ops:
            print(f"    {t / 5:8.3f} ms  {op[:90]}")

    for B in [int(b) for b in args.batches.split(",") if int(b) > 1]:
        carries = [tracking_carry(100 + i) for i in range(B)]
        cb = jax.tree.map(lambda *xs: jnp.stack(xs), *carries)
        fb = jnp.broadcast_to(frames, (B,) + frames.shape)
        ms = devtime(lambda c, f: track_scan_batched(c, f, jnp.int32(C), K,
                                                     cfg), cb, fb)
        agg = 1000 * B * C / ms
        print(f"track_scan_batched B={B:3d} C={C}: {ms:8.2f} ms/chunk "
              f"{ms / (B * C):6.3f} ms/frame-lane -> {agg:8.1f} agg fps",
              flush=True)


if __name__ == "__main__":
    main()
