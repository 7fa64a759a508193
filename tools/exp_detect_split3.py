"""Bisect _detect_level overhead. Usage: python -u tools/exp_detect_split3.py"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import _setup_jax_cache, _vo_config


def main():
    _setup_jax_cache()
    import jax
    import jax.numpy as jnp
    from tools.devtime import devtime
    from ros2_mono_vo_tpu.ops.features import (
        build_pyramid, _detect_level, fast_corner_score, harris_response,
        _nms3x3, _topk_scores)

    cfg = _vo_config(ba=True).frontend
    S = 2
    H, W = 376, 1232
    rng = np.random.default_rng(0)
    img_b = jnp.asarray(
        np.broadcast_to(rng.uniform(0, 255, (H, W)).astype(np.float32),
                        (S, H, W)))
    budgets = (223, 186, 155, 128, 107, 89, 74, 62)

    pyr = jax.jit(jax.vmap(lambda f: build_pyramid(
        f, cfg.num_pyramid_levels, cfg.pyramid_scale)))(img_b)

    det = jax.jit(jax.vmap(lambda ls: [_detect_level(l, b, cfg)
                                       for l, b in zip(ls, budgets)]))
    ms = devtime(det, pyr)
    print(f"_detect_level all (pyr precomputed): {ms:7.2f} ms", flush=True)

    det0 = jax.jit(jax.vmap(lambda ls: _detect_level(ls[0], budgets[0], cfg)))
    ms = devtime(det0, pyr)
    print(f"_detect_level level0 only:           {ms:7.2f} ms", flush=True)

    # variant without the inside-mask iota
    def dl_nomask(img, budget):
        img16 = img.astype(jnp.bfloat16)
        score = _nms3x3(fast_corner_score(img16, cfg.fast_threshold))
        harris = harris_response(img16).astype(jnp.float32)
        ranked = jnp.where(score > 0.0, harris, -jnp.inf)
        flat = ranked.reshape(-1)
        top, idx = _topk_scores(flat, budget)
        w = img.shape[1]
        rc = jnp.stack([idx // w, idx % w], axis=-1)
        valid = jnp.isfinite(top)
        return rc, jnp.where(valid, top, 0.0), valid

    det_nm = jax.jit(jax.vmap(lambda ls: [dl_nomask(l, b)
                                          for l, b in zip(ls, budgets)]))
    ms = devtime(det_nm, pyr)
    print(f"no inside-mask variant:              {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()


def main2():
    _setup_jax_cache()
    import jax
    import jax.numpy as jnp
    from tools.devtime import devtime
    from ros2_mono_vo_tpu.ops.features import (
        build_pyramid, fast_corner_score, harris_response,
        _nms3x3, _topk_scores)

    cfg = _vo_config(ba=True).frontend
    S = 2
    H, W = 376, 1232
    rng = np.random.default_rng(0)
    img_b = jnp.asarray(
        np.broadcast_to(rng.uniform(0, 255, (H, W)).astype(np.float32),
                        (S, H, W)))
    budgets = (223, 186, 155, 128, 107, 89, 74, 62)
    pyr = jax.jit(jax.vmap(lambda f: build_pyramid(
        f, cfg.num_pyramid_levels, cfg.pyramid_scale)))(img_b)

    def dl_barrier(img, budget):
        img16 = img.astype(jnp.bfloat16)
        score = _nms3x3(fast_corner_score(img16, cfg.fast_threshold))
        harris = harris_response(img16).astype(jnp.float32)
        margin = cfg.patch_size // 2 + 1
        h, w = img.shape
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        inside = ((rows >= margin) & (rows < h - margin)
                  & (cols >= margin) & (cols < w - margin))
        ranked = jnp.where((score > 0.0) & inside, harris, -jnp.inf)
        ranked = jax.lax.optimization_barrier(ranked)
        flat = ranked.reshape(-1)
        top, idx = _topk_scores(flat, budget)
        rc = jnp.stack([idx // w, idx % w], axis=-1)
        valid = jnp.isfinite(top)
        return rc, jnp.where(valid, top, 0.0), valid

    det_b = jax.jit(jax.vmap(lambda ls: [dl_barrier(l, b)
                                         for l, b in zip(ls, budgets)]))
    ms = devtime(det_b, pyr)
    print(f"barrier variant all levels:          {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main2()
