"""Compare lowerings of the LK inner-iteration sampling on the device.

The per-iteration work is: for N points, sample a win x win bilinear window
from a per-point [pc, pc] patch and reduce it against fixed per-point
gradient windows. Mathematically tiny (~3K flops/point) but layout-hostile:
batched [pc,pc]x[pc,win] matmuls pad to full MXU tiles. This tool measures
the candidates so ops/lk.py uses the fastest one.
"""
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO_ROOT, ".jax_cache"))

from tools.devtime import devtime

N, PC, WIN, ITERS = 1024, 39, 21, 10
rng = np.random.default_rng(0)
C = jnp.asarray(rng.uniform(0, 255, (N, PC, PC)).astype(np.float32))
gx = jnp.asarray(rng.standard_normal((N, WIN, WIN)).astype(np.float32))
gy = jnp.asarray(rng.standard_normal((N, WIN, WIN)).astype(np.float32))
iw = jnp.asarray(rng.uniform(0, 255, (N, WIN, WIN)).astype(np.float32))
i11 = jnp.ones((N,), jnp.float32) * 1e-3
i12 = jnp.zeros((N,), jnp.float32)
i22 = jnp.ones((N,), jnp.float32) * 1e-3
loc0 = jnp.asarray(rng.uniform(8, 10, (N, 2)).astype(np.float32))
offs = jnp.arange(WIN, dtype=jnp.float32) - WIN // 2


def hat(pos, size):
    k = jnp.arange(size, dtype=pos.dtype)
    return jnp.clip(1.0 - jnp.abs(pos[..., None] - k), 0.0, 1.0)


def gn(sample):
    def run(delta):
        for _ in range(ITERS):
            jw = sample(delta)
            di = jw - iw
            b1 = jnp.sum(di * gx, (-2, -1))
            b2 = jnp.sum(di * gy, (-2, -1))
            dv = jnp.stack([i11 * b1 + i12 * b2, i12 * b1 + i22 * b2], -1)
            delta = delta - dv
        return delta
    return jax.jit(run)


def sample_einsum(delta):
    wy = hat((loc0[:, 1] + delta[:, 1])[:, None] + offs, PC)
    wx = hat((loc0[:, 0] + delta[:, 0])[:, None] + offs, PC)
    tmp = jnp.einsum("nhw,ntw->nht", C, wx,
                     preferred_element_type=jnp.float32)
    return jnp.einsum("nsh,nht->nst", wy, tmp,
                      preferred_element_type=jnp.float32)


def sample_mulreduce(delta):
    wy = hat((loc0[:, 1] + delta[:, 1])[:, None] + offs, PC)
    wx = hat((loc0[:, 0] + delta[:, 0])[:, None] + offs, PC)
    tmp = jnp.sum(C[:, :, None, :] * wx[:, None, :, :], -1)   # [N, PC, WIN]
    return jnp.sum(wy[:, :, :, None] * tmp[:, None, :, :], -2)  # [N, WIN, WIN]


def sample_mulreduce_fused_b(delta):
    # directly produce b1/b2-style reductions is not separable; this variant
    # only reorders: columns first on the TRANSPOSED patch
    wy = hat((loc0[:, 1] + delta[:, 1])[:, None] + offs, PC)
    wx = hat((loc0[:, 0] + delta[:, 0])[:, None] + offs, PC)
    tmp = jnp.sum(C[:, None, :, :] * wy[:, :, :, None], -2)   # [N, WIN, PC]
    return jnp.sum(tmp[:, :, None, :] * wx[:, None, :, :], -1)


def sample_taps4(delta):
    # 4-tap form: integer shift via one-hot rows + scalar fractional blend
    py = loc0[:, 1] + delta[:, 1]
    px = loc0[:, 0] + delta[:, 0]
    iy = jnp.floor(py)
    ix = jnp.floor(px)
    fy = (py - iy)[:, None, None]
    fx = (px - ix)[:, None, None]
    oy = hat(iy[:, None] + offs, PC)          # one-hot rows (exact ints)
    oy1 = hat(iy[:, None] + offs + 1.0, PC)
    ox = hat(ix[:, None] + offs, PC)
    ox1 = hat(ix[:, None] + offs + 1.0, PC)
    t0 = jnp.einsum("nhw,ntw->nht", C, ox, preferred_element_type=jnp.float32)
    t1 = jnp.einsum("nhw,ntw->nht", C, ox1, preferred_element_type=jnp.float32)
    a00 = jnp.einsum("nsh,nht->nst", oy, t0, preferred_element_type=jnp.float32)
    a01 = jnp.einsum("nsh,nht->nst", oy, t1, preferred_element_type=jnp.float32)
    a10 = jnp.einsum("nsh,nht->nst", oy1, t0, preferred_element_type=jnp.float32)
    a11 = jnp.einsum("nsh,nht->nst", oy1, t1, preferred_element_type=jnp.float32)
    return ((1 - fy) * (1 - fx) * a00 + (1 - fy) * fx * a01
            + fy * (1 - fx) * a10 + fy * fx * a11)


d0 = jnp.zeros((N, 2), jnp.float32)
ref = None
for name, s in [("einsum (current)", sample_einsum),
                ("mul-reduce cols-first", sample_mulreduce),
                ("mul-reduce rows-first", sample_mulreduce_fused_b),
                ("4-tap (4 einsums + blend)", sample_taps4)]:
    fn = gn(s)
    out = jax.block_until_ready(fn(d0))
    if ref is None:
        ref = np.asarray(out)
    else:
        diff = np.abs(np.asarray(out) - ref).max()
        if diff > 2.0:
            print(f"  !! {name}: deviates (max {diff:.3f})")
    ms = devtime(fn, d0)
    print(f"{name:32s} {ms:8.3f} ms / {ITERS} iters "
          f"({ms / ITERS * 1000:6.1f} us/iter)", flush=True)
