"""Split lk_track cost at bench shapes: full vs reduced iters vs levels.

Per-iteration and per-level marginal costs tell us where a fused kernel
would pay. Usage: python -u tools/exp_lk_split.py [--batch 16]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import _setup_jax_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    _setup_jax_cache()
    import jax
    import jax.numpy as jnp
    from tools.devtime import devtime
    from ros2_mono_vo_tpu.ops.lk import build_lk_pyramid, lk_track

    B = args.batch
    H, W = 376, 1232
    NT = 256
    rng = np.random.default_rng(0)
    img1 = rng.uniform(0, 255, (H, W)).astype(np.float32)
    img2 = np.roll(img1, (3, 7), (0, 1)) + rng.normal(0, 2, (H, W)).astype(np.float32)
    pyr_fn = jax.jit(jax.vmap(lambda f: build_lk_pyramid(f, 4)))
    p1 = pyr_fn(jnp.asarray(np.broadcast_to(img1, (B, H, W))))
    p2 = pyr_fn(jnp.asarray(np.broadcast_to(img2, (B, H, W))))
    uv = jnp.asarray(
        np.broadcast_to(
            rng.uniform(30, [W - 30, H - 30], (NT, 2)).astype(np.float32),
            (B, NT, 2)))
    valid = jnp.ones((B, NT), bool)

    ms_pyr = devtime(pyr_fn, jnp.asarray(np.broadcast_to(img1, (B, H, W))))
    print(f"pyramid build      B={B}: {ms_pyr:7.2f} ms", flush=True)

    for iters in (10, 2):
        for levels in (4, 1):
            fn = jax.jit(jax.vmap(
                lambda a, b, u, v: lk_track(a[:levels], b[:levels], u, v,
                                            win=21, levels=levels,
                                            iters=iters)))
            ms = devtime(fn, p1, p2, uv, valid)
            print(f"lk iters={iters:2d} levels={levels}: {ms:7.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
