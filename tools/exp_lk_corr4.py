"""Piecewise timing: grouped conv alone vs GN-interp loop alone, plus
group-count scaling of the conv and an unfold-matmul conv alternative."""
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

PC, WIN, ITERS = 39, 21, 10
M = PC - WIN + 1
R = WIN // 2
rng = np.random.default_rng(0)


def conv_fn(C_, g2):
    K = C_.shape[0]
    out = jax.lax.conv_general_dilated(
        C_[None], g2.reshape(2 * K, 1, WIN, WIN).astype(C_.dtype),
        (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=K, preferred_element_type=jnp.float32)
    return out[0].reshape(K, 2, M, M)


jconv = jax.jit(conv_fn)

for K in (1024, 4096):
    C = jnp.asarray(rng.uniform(0, 255, (K, PC, PC)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    g2 = jnp.asarray(rng.standard_normal((K, 2, WIN, WIN)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    jax.block_until_ready(jconv(C, g2))
    print(f"grouped conv K={K}: {devtime(jconv, C, g2):8.3f} ms", flush=True)

K = 4096
C = jnp.asarray(rng.uniform(0, 255, (K, PC, PC)).astype(np.float32)
                ).astype(jnp.bfloat16)
g2 = jnp.asarray(rng.standard_normal((K, 2, WIN, WIN)).astype(np.float32)
                 ).astype(jnp.bfloat16)
corr2 = jax.block_until_ready(jconv(C, g2)).reshape(K, 2, M * M)
loc = jnp.asarray(rng.uniform(R + 2, R + M - 3, (K, 2)).astype(np.float32))
c12 = jnp.zeros((K, 2), jnp.float32)
i11 = jnp.full((K,), 1e-3, jnp.float32)
A_IDX = jnp.asarray((np.arange(M * M) // M).astype(np.float32))
B_IDX = jnp.asarray((np.arange(M * M) % M).astype(np.float32))


@jax.jit
def loop_flat(corr2_):
    delta = jnp.zeros((K, 2), jnp.float32)
    for _ in range(ITERS):
        u = (loc[:, 1] - R + delta[:, 1])[:, None]
        v = (loc[:, 0] - R + delta[:, 0])[:, None]
        w = (jnp.clip(1.0 - jnp.abs(u - A_IDX), 0.0, 1.0)
             * jnp.clip(1.0 - jnp.abs(v - B_IDX), 0.0, 1.0))
        b = jnp.sum(corr2_ * w[:, None, :], -1, dtype=jnp.float32) - c12
        dv = jnp.stack([i11 * b[:, 0], i11 * b[:, 1]], -1)
        delta = delta - dv
    return delta


jax.block_until_ready(loop_flat(corr2))
print(f"GN interp loop flat f32 [4096,2,361]: {devtime(loop_flat, corr2):8.3f} ms",
      flush=True)

corr2s = jnp.asarray(np.ascontiguousarray(
    np.asarray(corr2).reshape(K, 2 * M * M)))


@jax.jit
def loop_flat2(corr2_):
    """surfaces as [K, 2*361] single minor axis"""
    delta = jnp.zeros((K, 2), jnp.float32)
    for _ in range(ITERS):
        u = (loc[:, 1] - R + delta[:, 1])[:, None]
        v = (loc[:, 0] - R + delta[:, 0])[:, None]
        w = (jnp.clip(1.0 - jnp.abs(u - A_IDX), 0.0, 1.0)
             * jnp.clip(1.0 - jnp.abs(v - B_IDX), 0.0, 1.0))
        wc = jnp.concatenate([w, w], -1)
        bb = corr2_ * wc
        b1 = jnp.sum(bb[:, :M * M], -1)
        b2 = jnp.sum(bb[:, M * M:], -1)
        dv = jnp.stack([i11 * b1, i11 * b2], -1)
        delta = delta - dv
    return delta


jax.block_until_ready(loop_flat2(corr2s))
print(f"GN interp loop flat f32 [4096,722]:   {devtime(loop_flat2, corr2s):8.3f} ms",
      flush=True)


def unfold_conv(C_, g2):
    """xcorr via row-unfold one-hot matmul + WIN column FMAs."""
    ar = (jnp.arange(M)[:, None] + jnp.arange(WIN)[None, :]).reshape(-1)
    sel = jax.nn.one_hot(ar, PC, dtype=C_.dtype)              # [M*WIN, PC]
    Cr = jnp.einsum("ip,npb->nib", sel, C_,
                    preferred_element_type=jnp.float32)       # [K, M*WIN, PC]
    Cr = Cr.reshape(K, M, WIN, PC)
    acc = jnp.zeros((K, 2, M, M), jnp.float32)
    for q in range(WIN):
        acc = acc + jnp.sum(
            Cr[:, None, :, :, q:q + M].astype(jnp.float32)
            * g2[:, :, None, :, q, None].astype(jnp.float32), 3)
    return acc


junf = jax.jit(unfold_conv)
out = jax.block_until_ready(junf(C, g2))
dev = float(jnp.abs(out.reshape(K, 2, M * M) - corr2).max())
print(f"unfold-matmul xcorr K=4096: {devtime(junf, C, g2):8.3f} ms (dev {dev:.3f})",
      flush=True)
