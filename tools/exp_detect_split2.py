"""NMS / topk / mask split of _detect_level. Usage: python -u tools/exp_detect_split2.py"""
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
        build_pyramid, fast_corner_score, harris_response, _nms3x3)

    cfg = _vo_config(ba=True).frontend
    S = 2
    H, W = 376, 1232
    rng = np.random.default_rng(0)
    img_b = jnp.asarray(
        np.broadcast_to(rng.uniform(0, 255, (H, W)).astype(np.float32),
                        (S, H, W)))

    def scores(f):
        levels = build_pyramid(f, cfg.num_pyramid_levels, cfg.pyramid_scale)
        out = []
        for l in levels:
            i16 = l.astype(jnp.bfloat16)
            s = _nms3x3(fast_corner_score(i16, cfg.fast_threshold))
            h = harris_response(i16).astype(jnp.float32)
            out.append(jnp.where(s > 0, h, -jnp.inf))
        return out

    sc_fn = jax.jit(jax.vmap(scores))
    ms_sc = devtime(sc_fn, img_b)
    print(f"scores+nms all levels: {ms_sc:7.2f} ms", flush=True)
    ranked = sc_fn(img_b)

    budgets = (223, 186, 155, 128, 107, 89, 74, 62)

    def topk_all(rs):
        return [jax.lax.approx_max_k(r.reshape(r.shape[0], -1), k)[1]
                for r, k in zip(rs, budgets)]

    tk = jax.jit(topk_all)
    ms = devtime(tk, ranked)
    print(f"approx_max_k all levels: {ms:7.2f} ms", flush=True)

    def topk0(rs):
        r = rs[0]
        return jax.lax.approx_max_k(r.reshape(r.shape[0], -1), budgets[0])[1]

    ms = devtime(jax.jit(topk0), ranked)
    print(f"approx_max_k level0 only: {ms:7.2f} ms", flush=True)

    # exact top_k comparison at level 0
    def etopk0(rs):
        r = rs[0]
        return jax.lax.top_k(r.reshape(r.shape[0], -1), budgets[0])[1]

    ms = devtime(jax.jit(etopk0), ranked)
    print(f"exact top_k level0:      {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
