"""Verify the corr-surface LK identity exactly, then time production shapes.

Check 1 (exact identity, f32, one step, interior): b1/b2 from the sampled
window must equal the bilerp of the correlation surfaces to f32 roundoff.

Check 2 (convergent problem): build next = shifted prev, run both loops,
compare converged deltas.

Timing: vmapped over B lanes at per-lane N=256 (production shape).
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

PC, WIN = 39, 21
M = PC - WIN + 1
R = WIN // 2


def hat(pos, size):
    k = jnp.arange(size, dtype=pos.dtype)
    return jnp.clip(1.0 - jnp.abs(pos[..., None] - k), 0.0, 1.0)


def corr_conv(C_, g2, n):
    lhs = C_[None]                                   # [1, N, PC, PC]
    rhs = g2.reshape(2 * n, 1, WIN, WIN).astype(C_.dtype)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=n,
        preferred_element_type=jnp.float32)
    return out[0].reshape(n, 2, M, M)


# ---------------- check 1: one-step identity, f32 ----------------
rng = np.random.default_rng(0)
N = 64
C = jnp.asarray(rng.uniform(0, 255, (N, PC, PC)).astype(np.float32))
gx = jnp.asarray(rng.standard_normal((N, WIN, WIN)).astype(np.float32))
gy = jnp.asarray(rng.standard_normal((N, WIN, WIN)).astype(np.float32))
iw = jnp.asarray(rng.uniform(0, 255, (N, WIN, WIN)).astype(np.float32))
loc0 = jnp.asarray(rng.uniform(R + 1.0, R + M - 2.0, (N, 2)).astype(np.float32))
offs = jnp.arange(WIN, dtype=jnp.float32) - R


@jax.jit
def b_sample(delta):
    wy = hat((loc0[:, 1] + delta[:, 1])[:, None] + offs, PC)
    wx = hat((loc0[:, 0] + delta[:, 0])[:, None] + offs, PC)
    tmp = jnp.einsum("nhw,ntw->nht", C, wx, preferred_element_type=jnp.float32)
    jw = jnp.einsum("nsh,nht->nst", wy, tmp, preferred_element_type=jnp.float32)
    di = jw - iw
    return (jnp.sum(di * gx, (-2, -1)), jnp.sum(di * gy, (-2, -1)))


@jax.jit
def b_corr(delta):
    g2 = jnp.stack([gx, gy], 1)
    corr2 = corr_conv(C, g2, N)
    c1 = jnp.sum(iw * gx, (-2, -1))
    c2 = jnp.sum(iw * gy, (-2, -1))
    u = loc0[:, 1] - R + delta[:, 1]
    v = loc0[:, 0] - R + delta[:, 0]
    hu = hat(u, M)
    hv = hat(v, M)
    t = jnp.sum(corr2 * hv[:, None, None, :], -1)     # [N, 2, M]
    b = jnp.sum(t * hu[:, None, :], -1)               # [N, 2]
    return (b[:, 0] - c1, b[:, 1] - c2)


for trial in range(3):
    d = jnp.asarray(rng.uniform(-1.0, 1.0, (N, 2)).astype(np.float32))
    bs = b_sample(d)
    bc = b_corr(d)
    rel = max(float(jnp.abs(bs[i] - bc[i]).max()
                    / (jnp.abs(bs[i]).max() + 1e-6)) for i in range(2))
    print(f"check1 trial {trial}: max rel dev {rel:.2e}", flush=True)

# ---------------- check 2: convergent shifted-image problem ----------------
H = 200
img = rng.uniform(0, 255, (H + 4, H + 4)).astype(np.float32)
# smooth it so GN basin is wide
k = np.array([1, 4, 6, 4, 1], np.float32); k /= k.sum()
img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 0, img)
img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, img)
true_shift = rng.uniform(-2.0, 2.0, (N, 2)).astype(np.float32)


def bilsample(im, ys, xs):
    y0 = np.floor(ys).astype(int); x0 = np.floor(xs).astype(int)
    fy = ys - y0; fx = xs - x0
    return ((1 - fy) * (1 - fx) * im[y0, x0] + (1 - fy) * fx * im[y0, x0 + 1]
            + fy * (1 - fx) * im[y0 + 1, x0] + fy * fx * im[y0 + 1, x0 + 1])


Cs, iws, gxs, gys, locs = [], [], [], [], []
for i in range(N):
    oy, ox = rng.integers(2, H - PC - 2, 2)
    patch = img[oy:oy + PC, ox:ox + PC]
    Cs.append(patch)
    # template = patch content at center window shifted by true_shift
    cy = oy + R + M // 2 + true_shift[i, 1]
    cx = ox + R + M // 2 + true_shift[i, 0]
    ys = cy + np.arange(-R - 1, R + 2)[:, None] + np.zeros((1, WIN + 2))
    xs = cx + np.zeros((WIN + 2, 1)) + np.arange(-R - 1, R + 2)[None, :]
    ext = bilsample(img, ys, xs)
    iws.append(ext[1:-1, 1:-1])
    gys.append(0.5 * (ext[2:, 1:-1] - ext[:-2, 1:-1]))
    gxs.append(0.5 * (ext[1:-1, 2:] - ext[1:-1, :-2]))
    locs.append([R + M // 2, R + M // 2])  # guess = patch center (no shift)

C = jnp.asarray(np.stack(Cs))
iw = jnp.asarray(np.stack(iws).astype(np.float32))
gx = jnp.asarray(np.stack(gxs).astype(np.float32))
gy = jnp.asarray(np.stack(gys).astype(np.float32))
loc0 = jnp.asarray(np.array(locs, np.float32))

a11 = jnp.sum(gx * gx, (-2, -1)); a12 = jnp.sum(gx * gy, (-2, -1))
a22 = jnp.sum(gy * gy, (-2, -1))
det = a11 * a22 - a12 * a12
i11, i12, i22 = a22 / det, -a12 / det, a11 / det


def gn(bfn, iters=10):
    delta = jnp.zeros((N, 2), jnp.float32)
    for _ in range(iters):
        b1, b2 = bfn(delta)
        dv = jnp.stack([i11 * b1 + i12 * b2, i12 * b1 + i22 * b2], -1)
        delta = delta - dv
    return delta


d_s = np.asarray(gn(b_sample))
d_c = np.asarray(gn(b_corr))
# converged delta should be ~ -true_shift (template is at center + shift;
# guess at center; flow moves window onto template)
err_s = np.abs(d_s - true_shift).max()
err_c = np.abs(d_c - true_shift).max()
print(f"check2: |delta-true| sample {err_s:.4f} corr {err_c:.4f}; "
      f"max |d_s-d_c| {np.abs(d_s - d_c).max():.5f}", flush=True)

# ---------------- timing at production shapes, vmapped ----------------
for B, NL in [(16, 256), (1, 256)]:
    Cb = jnp.asarray(rng.uniform(0, 255, (B, NL, PC, PC)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    g2b = jnp.asarray(rng.standard_normal((B, NL, 2, WIN, WIN)
                                          ).astype(np.float32)
                      ).astype(jnp.bfloat16)
    locb = jnp.asarray(rng.uniform(R + 2, R + M - 3, (B, NL, 2)
                                   ).astype(np.float32))
    iwb = jnp.asarray(rng.uniform(0, 255, (B, NL, WIN, WIN)
                                  ).astype(np.float32))

    def lane(C_, g2_, loc_, iw_):
        corr2 = corr_conv(C_, g2_, NL)
        c1 = jnp.sum(iw_ * g2_[:, 0].astype(jnp.float32), (-2, -1))
        c2 = jnp.sum(iw_ * g2_[:, 1].astype(jnp.float32), (-2, -1))
        delta = jnp.zeros((NL, 2), jnp.float32)
        for _ in range(10):
            u = loc_[:, 1] - R + delta[:, 1]
            v = loc_[:, 0] - R + delta[:, 0]
            hu = hat(u, M); hv = hat(v, M)
            t = jnp.sum(corr2 * hv[:, None, None, :], -1)
            b = jnp.sum(t * hu[:, None, :], -1)
            dv = 1e-3 * jnp.stack([b[:, 0] - c1, b[:, 1] - c2], -1)
            delta = delta - dv
        return delta

    f = jax.jit(jax.vmap(lane))
    jax.block_until_ready(f(Cb, g2b, locb, iwb))
    ms = devtime(f, Cb, g2b, locb, iwb)
    print(f"vmapped B={B} N={NL}: corr precompute + 10 GN iters "
          f"{ms:8.3f} ms", flush=True)
