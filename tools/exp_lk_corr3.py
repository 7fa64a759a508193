"""Production-shape timing of corr-surface GN variants (vmapped B lanes).

Variants:
  current  : einsum sampling loop (what ops/lk.py does today)
  corr4d   : custom-vmap grouped conv + jnp loop on [N, 2, M, M] f32
  corrflat : same but surfaces flattened to [N, 2, M*M] (lane-friendly)
  corrbf16 : corrflat with bf16 surfaces
"""
import os
import sys
import functools

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO_ROOT, ".jax_cache"))

from tools.devtime import devtime

PC, WIN, ITERS = 39, 21, 10
M = PC - WIN + 1
R = WIN // 2
B, NL = 16, 256


def hat(pos, size):
    k = jnp.arange(size, dtype=pos.dtype)
    return jnp.clip(1.0 - jnp.abs(pos[..., None] - k), 0.0, 1.0)


@jax.jit
def _xcorr_flat(C_, g2):
    """C_ [K, pc, pc], g2 [K, 2, win, win] -> [K, 2, M, M] f32."""
    K = C_.shape[0]
    out = jax.lax.conv_general_dilated(
        C_[None], g2.reshape(2 * K, 1, WIN, WIN).astype(C_.dtype),
        (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=K, preferred_element_type=jnp.float32)
    return out[0].reshape(K, 2, M, M)


@jax.custom_batching.custom_vmap
def xcorr(C_, g2):
    return _xcorr_flat(C_, g2)


@xcorr.def_vmap
def xcorr_vmap(axis_size, in_batched, C_, g2):
    cb, gb = in_batched
    if not cb:
        C_ = jnp.broadcast_to(C_, (axis_size,) + C_.shape)
    if not gb:
        g2 = jnp.broadcast_to(g2, (axis_size,) + g2.shape)
    A, n = C_.shape[:2]
    out = _xcorr_flat(C_.reshape((A * n,) + C_.shape[2:]),
                      g2.reshape((A * n,) + g2.shape[2:]))
    return out.reshape((A, n) + out.shape[1:]), True


rng = np.random.default_rng(0)
Cb = jnp.asarray(rng.uniform(0, 255, (B, NL, PC, PC)).astype(np.float32)
                 ).astype(jnp.bfloat16)
g2b = jnp.asarray(rng.standard_normal((B, NL, 2, WIN, WIN)).astype(np.float32)
                  ).astype(jnp.bfloat16)
locb = jnp.asarray(rng.uniform(R + 2, R + M - 3, (B, NL, 2)).astype(np.float32))
iwb = jnp.asarray(rng.uniform(0, 255, (B, NL, WIN, WIN)).astype(np.float32)
                  ).astype(jnp.bfloat16)
gx16 = g2b[:, :, 0]
gy16 = g2b[:, :, 1]
i11 = jnp.full((B, NL), 1e-3, jnp.float32)
i12 = jnp.zeros((B, NL), jnp.float32)
i22 = jnp.full((B, NL), 1e-3, jnp.float32)
offs = jnp.arange(WIN, dtype=jnp.float32) - R


def lane_current(C_, gx_, gy_, iw_, loc_, i11_, i12_, i22_):
    def sample(delta):
        wy = hat((loc_[:, 1] + delta[:, 1])[:, None] + offs, PC).astype(jnp.bfloat16)
        wx = hat((loc_[:, 0] + delta[:, 0])[:, None] + offs, PC).astype(jnp.bfloat16)
        tmp = jnp.einsum("nhw,ntw->nht", C_, wx,
                         preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return jnp.einsum("nsh,nht->nst", wy, tmp,
                          preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    delta = jnp.zeros((NL, 2), jnp.float32)
    for _ in range(ITERS):
        jw = sample(delta)
        di = jw - iw_
        b1 = jnp.sum(di * gx_, (-2, -1), dtype=jnp.float32)
        b2 = jnp.sum(di * gy_, (-2, -1), dtype=jnp.float32)
        dv = jnp.stack([i11_ * b1 + i12_ * b2, i12_ * b1 + i22_ * b2], -1)
        delta = delta - dv
    return delta


def lane_corr4d(C_, g2_, iw_, loc_, i11_, i12_, i22_):
    corr2 = xcorr(C_, g2_)
    c1 = jnp.sum(iw_.astype(jnp.float32) * g2_[:, 0].astype(jnp.float32), (-2, -1))
    c2 = jnp.sum(iw_.astype(jnp.float32) * g2_[:, 1].astype(jnp.float32), (-2, -1))
    delta = jnp.zeros((NL, 2), jnp.float32)
    for _ in range(ITERS):
        u = loc_[:, 1] - R + delta[:, 1]
        v = loc_[:, 0] - R + delta[:, 0]
        hu = hat(u, M); hv = hat(v, M)
        t = jnp.sum(corr2 * hv[:, None, None, :], -1)
        b = jnp.sum(t * hu[:, None, :], -1)
        b1 = b[:, 0] - c1; b2 = b[:, 1] - c2
        dv = jnp.stack([i11_ * b1 + i12_ * b2, i12_ * b1 + i22_ * b2], -1)
        delta = delta - dv
    return delta


A_IDX = jnp.asarray((np.arange(M * M) // M).astype(np.float32))
B_IDX = jnp.asarray((np.arange(M * M) % M).astype(np.float32))


def lane_corrflat(C_, g2_, iw_, loc_, i11_, i12_, i22_, sdtype=jnp.float32):
    corr2 = xcorr(C_, g2_).reshape(NL, 2, M * M).astype(sdtype)
    c1 = jnp.sum(iw_.astype(jnp.float32) * g2_[:, 0].astype(jnp.float32), (-2, -1))
    c2 = jnp.sum(iw_.astype(jnp.float32) * g2_[:, 1].astype(jnp.float32), (-2, -1))
    delta = jnp.zeros((NL, 2), jnp.float32)
    for _ in range(ITERS):
        u = (loc_[:, 1] - R + delta[:, 1])[:, None]
        v = (loc_[:, 0] - R + delta[:, 0])[:, None]
        w = (jnp.clip(1.0 - jnp.abs(u - A_IDX), 0.0, 1.0)
             * jnp.clip(1.0 - jnp.abs(v - B_IDX), 0.0, 1.0)).astype(sdtype)
        b = jnp.sum(corr2 * w[:, None, :], -1, dtype=jnp.float32)
        b1 = b[:, 0] - c1; b2 = b[:, 1] - c2
        dv = jnp.stack([i11_ * b1 + i12_ * b2, i12_ * b1 + i22_ * b2], -1)
        delta = delta - dv
    return delta


f_cur = jax.jit(jax.vmap(lane_current))
f_4d = jax.jit(jax.vmap(lane_corr4d))
f_flat = jax.jit(jax.vmap(functools.partial(lane_corrflat, sdtype=jnp.float32)))
f_bf16 = jax.jit(jax.vmap(functools.partial(lane_corrflat, sdtype=jnp.bfloat16)))

args_cur = (Cb, gx16, gy16, iwb, locb, i11, i12, i22)
args_corr = (Cb, g2b, iwb, locb, i11, i12, i22)

ref = np.asarray(jax.block_until_ready(f_cur(*args_cur)))
print(f"current einsum loop        {devtime(f_cur, *args_cur):8.3f} ms", flush=True)
for name, f in [("corr4d f32", f_4d), ("corrflat f32", f_flat),
                ("corrflat bf16", f_bf16)]:
    out = np.asarray(jax.block_until_ready(f(*args_corr)))
    dev = np.abs(out - ref).max()
    print(f"{name:26s} {devtime(f, *args_corr):8.3f} ms (dev {dev:.4f})",
          flush=True)
