"""Correlation-surface LK: can the GN loop drop its per-iteration matmuls?

Key identity: the GN right-hand side b1(d) = sum_{s,t} J(d)[s,t] * gx[s,t]
is BILINEAR in the subpixel window origin, because bilinear sampling
commutes with a fixed-window dot product:

    b1(u, v) = bilerp( corr_x, u, v ) - const,
    corr_x[a, b] = sum_{s,t} C[a+s, b+t] * gx[s, t]

So instead of re-sampling the full [win, win] window every iteration (two
batched [win,pc]x[pc,pc] matmuls), precompute the two correlation surfaces
[N, M, M] (M = pc - win + 1) once per level and make each GN iteration a
4-tap interpolation + 2x2 solve — pure elementwise VPU work.

This tool measures precompute candidates and the end-to-end loop cost vs
the current einsum formulation, and checks the deltas agree.
"""
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO_ROOT, ".jax_cache"))

from tools.devtime import devtime

N, PC, WIN, ITERS = 1024, 39, 21, 10
M = PC - WIN + 1
R = WIN // 2
rng = np.random.default_rng(0)
C = jnp.asarray(rng.uniform(0, 255, (N, PC, PC)).astype(np.float32))
C16 = C.astype(jnp.bfloat16)
gx = jnp.asarray(rng.standard_normal((N, WIN, WIN)).astype(np.float32))
gy = jnp.asarray(rng.standard_normal((N, WIN, WIN)).astype(np.float32))
iw = jnp.asarray(rng.uniform(0, 255, (N, WIN, WIN)).astype(np.float32))
gx16, gy16, iw16 = (t.astype(jnp.bfloat16) for t in (gx, gy, iw))
i11 = jnp.ones((N,), jnp.float32) * 1e-3
i12 = jnp.zeros((N,), jnp.float32)
i22 = jnp.ones((N,), jnp.float32) * 1e-3
# interior window origins: u = loc - R + delta stays in [0, M-1)
loc0 = jnp.asarray(rng.uniform(R + 2, R + M - 3, (N, 2)).astype(np.float32))
offs = jnp.arange(WIN, dtype=jnp.float32) - R


def hat(pos, size):
    k = jnp.arange(size, dtype=pos.dtype)
    return jnp.clip(1.0 - jnp.abs(pos[..., None] - k), 0.0, 1.0)


# ---------------- current formulation (baseline) ----------------
def sample_einsum(delta):
    wy = hat((loc0[:, 1] + delta[:, 1])[:, None] + offs, PC).astype(jnp.bfloat16)
    wx = hat((loc0[:, 0] + delta[:, 0])[:, None] + offs, PC).astype(jnp.bfloat16)
    tmp = jnp.einsum("nhw,ntw->nht", C16, wx,
                     preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return jnp.einsum("nsh,nht->nst", wy, tmp,
                      preferred_element_type=jnp.float32).astype(jnp.bfloat16)


@jax.jit
def gn_einsum(delta):
    for _ in range(ITERS):
        jw = sample_einsum(delta)
        di = jw - iw16
        b1 = jnp.sum(di * gx16, (-2, -1), dtype=jnp.float32)
        b2 = jnp.sum(di * gy16, (-2, -1), dtype=jnp.float32)
        dv = jnp.stack([i11 * b1 + i12 * b2, i12 * b1 + i22 * b2], -1)
        delta = delta - dv
    return delta


# ---------------- corr-surface precompute candidates ----------------
def corr_conv(C_, g2):
    """Grouped conv: lhs [1, N, PC, PC], rhs [2N, 1, WIN, WIN] -> [1, 2N, M, M].
    g2: [N, 2, WIN, WIN] (gx, gy stacked)."""
    lhs = C_[None]
    rhs = g2.reshape(2 * N, 1, WIN, WIN).astype(C_.dtype)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=N,
        preferred_element_type=jnp.float32)
    return out[0].reshape(N, 2, M, M)


def corr_twostage(C_, g2):
    """Stage A: contract q with 21 shifted FMAs -> [N, 2, WIN, PC, M] never
    materialized whole; accumulate stage B inline per p."""
    acc = jnp.zeros((N, 2, M, M), jnp.float32)
    for p in range(WIN):
        rowc = jnp.zeros((N, 2, M, M), jnp.float32)
        for q in range(WIN):
            rowc = rowc + (C_[:, None, p:p + M, q:q + M].astype(jnp.float32)
                           * g2[:, :, p:p + 1, q:q + 1])
        acc = acc + rowc
    return acc


def corr_matmul(C_, g2):
    """Row-unfold via shared one-hot + one batched matmul over flattened
    kernel columns: Cr[n, (a,p), :] = C[n, a+p, :]; then contract q by a
    banded per-point matrix? No -- instead contract (p,q) jointly:
    corr[n, a, b] = sum_{p} Cr[n, a, p, b:b+WIN] . g[n, p, :].
    Done as WIN shifted FMAs on the unfolded tensor."""
    ar = jnp.arange(M)[:, None] + jnp.arange(WIN)[None, :]      # [M, WIN]
    sel = jax.nn.one_hot(ar.reshape(-1), PC, dtype=C_.dtype)    # [M*WIN, PC]
    Cr = jnp.einsum("ip,npb->nib", sel, C_,
                    preferred_element_type=jnp.float32)
    Cr = Cr.reshape(N, M, WIN, PC)
    acc = jnp.zeros((N, 2, M, M), jnp.float32)
    for q in range(WIN):
        acc = acc + jnp.sum(
            Cr[:, None, :, :, q:q + M] * g2[:, :, None, :, q - WIN - 1:q - WIN]
            if False else
            Cr[:, None, :, :, q:q + M] * jnp.swapaxes(g2, -1, -2)[..., None, q:q + 1, :].swapaxes(-1, -2),
            axis=3)
    return acc


g2 = jnp.stack([gx, gy], 1)
g2_16 = g2.astype(jnp.bfloat16)


def gn_corr(corr2):
    """corr2: [N, 2, M, M] f32. c1/c2 constants from template."""
    c1 = jnp.sum(iw * gx, (-2, -1))
    c2 = jnp.sum(iw * gy, (-2, -1))
    u0 = loc0[:, 1] - R        # window-origin y at delta=0
    v0 = loc0[:, 0] - R
    km = jnp.arange(M, dtype=jnp.float32)

    def step(delta):
        u = u0 + delta[:, 1]
        v = v0 + delta[:, 0]
        hu = hat(u, M)                      # [N, M] 2 taps
        hv = hat(v, M)
        w = hu[:, None, :, None] * hv[:, None, None, :]   # [N,1,M,M]
        b = jnp.sum(corr2 * w, (-2, -1))                  # [N, 2]
        b1 = b[:, 0] - c1
        b2 = b[:, 1] - c2
        dv = jnp.stack([i11 * b1 + i12 * b2, i12 * b1 + i22 * b2], -1)
        return delta - dv

    delta = jnp.zeros((N, 2), jnp.float32)
    for _ in range(ITERS):
        delta = step(delta)
    return delta


@jax.jit
def full_conv(delta0):
    corr2 = corr_conv(C16, g2_16)
    return gn_corr(corr2)


@jax.jit
def full_twostage(delta0):
    corr2 = corr_twostage(C16, g2_16)
    return gn_corr(corr2)


@jax.jit
def precompute_conv_only(_):
    return corr_conv(C16, g2_16)


@jax.jit
def gn_only(corr2):
    return gn_corr(corr2)


d0 = jnp.zeros((N, 2), jnp.float32)
ref = np.asarray(jax.block_until_ready(gn_einsum(d0)))
ms0 = devtime(gn_einsum, d0)
print(f"einsum (current, bf16)      {ms0:8.3f} ms / {ITERS} iters", flush=True)

for name, fn in [("corr conv grouped", full_conv),
                 ("corr 441-FMA", full_twostage)]:
    try:
        out = np.asarray(jax.block_until_ready(fn(d0)))
        diff = np.abs(out - ref).max()
        ms = devtime(fn, d0)
        print(f"{name:28s} {ms:8.3f} ms total (delta dev {diff:.4f})",
              flush=True)
    except Exception as e:  # noqa
        print(f"{name:28s} FAILED: {type(e).__name__}: {e}", flush=True)

corr2 = jax.block_until_ready(precompute_conv_only(d0))
print(f"  precompute conv only       {devtime(precompute_conv_only, d0):8.3f} ms",
      flush=True)
print(f"  gn loop only               {devtime(gn_only, corr2):8.3f} ms",
      flush=True)
