"""Test optimization_barrier placements inside lk_track.

Usage: python -u tools/exp_lk_barrier.py [--batch 16]
"""
from __future__ import annotations

import argparse
import functools
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
    import ros2_mono_vo_tpu.ops.lk as lk

    B = args.batch
    H, W = 376, 1232
    NT = 256
    rng = np.random.default_rng(0)
    img1 = rng.uniform(0, 255, (H, W)).astype(np.float32)
    img2 = np.roll(img1, (3, 7), (0, 1)) + rng.normal(0, 2, (H, W)).astype(
        np.float32)
    pyr_fn = jax.jit(jax.vmap(lambda f: lk.build_lk_pyramid(f, 4)))
    p1 = pyr_fn(jnp.asarray(np.broadcast_to(img1, (B, H, W))))
    p2 = pyr_fn(jnp.asarray(np.broadcast_to(img2, (B, H, W))))
    uv = jnp.asarray(
        np.broadcast_to(
            rng.uniform(30, [W - 30, H - 30], (NT, 2)).astype(np.float32),
            (B, NT, 2)))
    valid = jnp.ones((B, NT), bool)

    fn = jax.jit(jax.vmap(
        lambda a, b, u, v: lk.lk_track(a, b, u, v, win=21, levels=4,
                                       iters=10)))
    ms = devtime(fn, p1, p2, uv, valid)
    print(f"lk_track baseline: {ms:7.2f} ms", flush=True)

    # monkeypatch: barrier after compact + after ext_win
    orig_sample = lk.sample_patch

    def sample_b(patch, wy, wx, out_dtype=None):
        out = orig_sample(patch, wy, wx, out_dtype=out_dtype)
        return jax.lax.optimization_barrier(out)

    lk.sample_patch = sample_b
    fn2 = jax.jit(jax.vmap(
        lambda a, b, u, v: lk.lk_track(a, b, u, v, win=21, levels=4,
                                       iters=10)))
    ms = devtime(fn2, p1, p2, uv, valid)
    print(f"lk_track barrier-after-samples: {ms:7.2f} ms", flush=True)
    lk.sample_patch = orig_sample


if __name__ == "__main__":
    main()
