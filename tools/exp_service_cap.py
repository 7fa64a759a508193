"""A/B the batched keyframe-service cap S at B=16 on the bench drive.

Service cost is paid per fire padded to S lanes, and in steady state the
stage fires almost every frame-row — so S is a direct cost knob. This
measures aggregate fps AND worst-lane ATE for S in {4 (default), 3, 2}
with the bench's distinct lane scenes, to see whether the urgency queue
absorbs the lower cap without accuracy loss.

Usage: python -u tools/exp_service_cap.py [--caps 0,3,2] [--batch 16]
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--caps", default="0,3,2")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=150)
    args = ap.parse_args()
    import bench
    bench._setup_jax_cache()

    n = args.frames
    scene, poses, frames = bench.make_sequence(n)
    lane_data = [(poses, np.clip(np.stack(frames), 0, 255).astype(np.uint8))]
    s = 1
    import jax.numpy as jnp
    from ros2_mono_vo_tpu.ops.features import (detect_and_describe,
                                               occupancy_grid_check)
    cfg0 = bench._vo_config()

    def initializable(scene_s, frames_s):
        for f in frames_s[:5]:
            feats = detect_and_describe(jnp.asarray(f, jnp.float32),
                                        cfg0.frontend)
            ok, _ = occupancy_grid_check(
                feats.uv, feats.valid, scene_s.image_shape,
                cfg0.initializer.occupancy_grid_div,
                cfg0.initializer.kp_distribution_thresh)
            if not bool(ok):
                return False
        return True

    while len(lane_data) < args.batch and s < 64:
        scene_s, p_s, f_s = bench.make_sequence(n, seed=s)
        if initializable(scene_s, f_s):
            lane_data.append(
                (p_s, np.clip(np.stack(f_s), 0, 255).astype(np.uint8)))
        s += 1

    base_cfg = bench._vo_config(ba=True)
    for cap in [int(c) for c in args.caps.split(",")]:
        cfg = dataclasses.replace(
            base_cfg,
            frontend=dataclasses.replace(base_cfg.frontend,
                                         kf_service_cap=cap))
        orig = bench._vo_config
        bench._vo_config = lambda ba=False, lc=False, _c=cfg: _c
        try:
            agg, worst, n_timed, _ = bench.run_ours_batched(
                scene, lane_data, batch=args.batch)
        finally:
            bench._vo_config = orig
        print(f"cap={cap or 'default(B/4)'}: agg {agg:.1f} fps over "
              f"{n_timed} lane-frames, worst-lane ATE {worst:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
