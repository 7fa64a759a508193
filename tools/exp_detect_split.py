"""Stage split of detect_and_describe at service shapes (S lanes).

Usage: python -u tools/exp_detect_split.py [--lanes 2]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import _setup_jax_cache, _vo_config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=2)
    args = ap.parse_args()
    _setup_jax_cache()
    import jax
    import jax.numpy as jnp
    from tools.devtime import devtime
    from ros2_mono_vo_tpu.ops.features import (
        build_pyramid, fast_corner_score, harris_response, _nms3x3,
        _detect_level, _describe_level, detect_and_describe)
    from ros2_mono_vo_tpu.config import level_feature_budget

    cfg = _vo_config(ba=True).frontend
    S = args.lanes
    H, W = 376, 1232
    rng = np.random.default_rng(0)
    img_b = jnp.asarray(
        np.broadcast_to(rng.uniform(0, 255, (H, W)).astype(np.float32),
                        (S, H, W)))

    full = jax.jit(jax.vmap(lambda f: detect_and_describe(f, cfg)))
    ms = devtime(full, img_b)
    print(f"detect_and_describe S={S}: {ms:7.2f} ms", flush=True)

    pyr_fn = jax.jit(jax.vmap(
        lambda f: build_pyramid(f, cfg.num_pyramid_levels, cfg.pyramid_scale)))
    ms = devtime(pyr_fn, img_b)
    print(f"  build_pyramid:        {ms:7.2f} ms", flush=True)
    levels = pyr_fn(img_b)
    budgets = level_feature_budget(cfg)
    print(f"  budgets: {budgets}", flush=True)

    fast_all = jax.jit(jax.vmap(lambda f: [
        fast_corner_score(l.astype(jnp.bfloat16), cfg.fast_threshold)
        for l in [build_pyramid(f, cfg.num_pyramid_levels,
                                cfg.pyramid_scale)[i]
                  for i in range(cfg.num_pyramid_levels)]]))
    ms_pyr = devtime(pyr_fn, img_b)
    ms = devtime(fast_all, img_b)
    print(f"  fast_corner_score(all levels): {ms - ms_pyr:7.2f} ms",
          flush=True)

    harris_all = jax.jit(jax.vmap(lambda f: [
        harris_response(l.astype(jnp.bfloat16))
        for l in build_pyramid(f, cfg.num_pyramid_levels, cfg.pyramid_scale)]))
    ms = devtime(harris_all, img_b)
    print(f"  harris(all levels):   {ms - ms_pyr:7.2f} ms", flush=True)

    det_all = jax.jit(jax.vmap(lambda f: [
        _detect_level(l, b, cfg)
        for l, b in zip(build_pyramid(f, cfg.num_pyramid_levels,
                                      cfg.pyramid_scale), budgets) if b]))
    ms = devtime(det_all, img_b)
    print(f"  detect(all levels):   {ms - ms_pyr:7.2f} ms  "
          f"(incl fast+harris+nms+topk)", flush=True)

    # describe only: use detected rc from level 0
    det0 = jax.jit(jax.vmap(lambda f: _detect_level(f, budgets[0], cfg)))
    rc0, _, _ = det0(img_b)
    desc0 = jax.jit(jax.vmap(lambda f, rc: _describe_level(f, rc)))
    ms = devtime(desc0, img_b, rc0)
    print(f"  describe(level0, {budgets[0]} kp): {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
