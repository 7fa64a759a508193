"""Prototype: fused Pallas GN-iteration kernel for LK vs the XLA op chain.

The per-level GN loop is ~10 iterations of tiny batched matmuls + VPU ops
whose intermediates ([N, 21, pc] etc.) pad their minor dim to 128 lanes —
the measured cost is HBM traffic of padded intermediates, not FLOPs. A
fused kernel keeps the compact patch + windows resident in VMEM across all
iterations.

Usage: python -u tools/proto_lk_kernel.py
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.devtime import devtime

N = 4096
PC = 49
WIN = 21
ITERS = 10
R = WIN // 2


def _hat(pos, size, dtype):
    k = jnp.arange(size, dtype=jnp.float32)
    return jnp.clip(1.0 - jnp.abs(pos[..., None] - k), 0.0, 1.0).astype(dtype)


# ---------------- XLA reference (mirrors ops/lk.py inner loop) -------------
@jax.jit
def gn_xla(compact, iw, gxw, gyw, i11, i12, i22, loc0):
    offs = jnp.arange(WIN, dtype=jnp.float32) - R

    def sample(delta):
        wy = _hat(loc0[:, 1, None] + delta[:, 1, None] + offs, PC,
                  jnp.bfloat16)
        wx = _hat(loc0[:, 0, None] + delta[:, 0, None] + offs, PC,
                  jnp.bfloat16)
        tmp = jnp.einsum("nhw,ntw->nht", compact, wx,
                         preferred_element_type=jnp.float32)
        return jnp.einsum("nsh,nht->nst", wy, tmp,
                          preferred_element_type=jnp.float32)

    delta = jnp.zeros((N, 2), jnp.float32)
    for _ in range(ITERS):
        jw = sample(delta)
        di = jw - iw
        b1 = jnp.sum(di * gxw, (-2, -1))
        b2 = jnp.sum(di * gyw, (-2, -1))
        dv = jnp.stack([i11 * b1 + i12 * b2, i12 * b1 + i22 * b2], -1)
        delta = delta - dv
    return delta


# ---------------- Pallas fused kernel --------------------------------------
PB = 64   # points per grid program


def _kernel(compact_ref, iw_ref, gxw_ref, gyw_ref, inv_ref, loc_ref,
            out_ref):
    # Mosaic layout inference aborts on rank-1 vectors AND on rank-changing
    # reshapes of tiny shapes — so scalar-per-point values ride as
    # [PB, 1, k] rank-3 tensors end to end: only slices and broadcasts.
    compact = compact_ref[:]                        # [PB, PC, PC] bf16
    iw = iw_ref[:]                                  # [PB, WIN, WIN] f32
    gxw = gxw_ref[:]
    gyw = gyw_ref[:]
    i11 = inv_ref[:, :, 0:1]                        # [PB, 1, 1]
    i12 = inv_ref[:, :, 1:2]
    i22 = inv_ref[:, :, 2:3]
    locx = loc_ref[:, :, 0:1]                       # [PB, 1, 1]
    locy = loc_ref[:, :, 1:2]
    offs = jax.lax.broadcasted_iota(
        jnp.int32, (1, WIN, 1), 1).astype(jnp.float32) - R   # [1, WIN, 1]
    k = jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, PC), 2).astype(jnp.float32)        # [1, 1, PC]

    dx = jnp.zeros((PB, 1, 1), jnp.float32)
    dy = jnp.zeros((PB, 1, 1), jnp.float32)

    for _ in range(ITERS):
        posy = locy + dy + offs                     # [PB, WIN, 1]
        posx = locx + dx + offs
        wy = jnp.clip(1.0 - jnp.abs(posy - k), 0.0, 1.0).astype(jnp.bfloat16)
        wx = jnp.clip(1.0 - jnp.abs(posx - k), 0.0, 1.0).astype(jnp.bfloat16)
        tmp = jax.lax.dot_general(
            compact, wx, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)     # [PB, PC, WIN]
        jw = jax.lax.dot_general(
            wy, tmp, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)     # [PB, WIN, WIN]
        di = jw - iw
        # Frobenius inner products <di, g> as two chained matmuls against a
        # ones vector — jnp.sum(keepdims) lowers to reduce+reshape, which
        # Mosaic's layout inference rejects at these shapes.
        ones_t = jnp.ones((PB, WIN, 1), jnp.float32)
        rx = jax.lax.dot_general(di * gxw, ones_t,
                                 (((2,), (1,)), ((0,), (0,))))  # [PB, WIN, 1]
        ry = jax.lax.dot_general(di * gyw, ones_t,
                                 (((2,), (1,)), ((0,), (0,))))
        b1 = jax.lax.dot_general(rx, ones_t,
                                 (((1,), (1,)), ((0,), (0,))))  # [PB, 1, 1]
        b2 = jax.lax.dot_general(ry, ones_t,
                                 (((1,), (1,)), ((0,), (0,))))
        dx = dx - (i11 * b1 + i12 * b2)
        dy = dy - (i12 * b1 + i22 * b2)
    out_ref[:, :, 0:1] = dx
    out_ref[:, :, 1:2] = dy


@jax.jit
def gn_pallas(compact, iw, gxw, gyw, i11, i12, i22, loc0):
    inv = jnp.stack([i11, i12, i22], -1)[:, None, :]   # [N, 1, 3]
    loc3 = loc0[:, None, :]                            # [N, 1, 2]
    grid = N // PB
    out = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((PB, PC, PC), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, WIN, WIN), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, WIN, WIN), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, WIN, WIN), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, 1, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, 1, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((PB, 1, 2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 1, 2), jnp.float32),
    )(compact, iw, gxw, gyw, inv, loc3)
    return out[:, 0, :]


def main():
    rng = np.random.default_rng(0)
    compact = jnp.asarray(rng.uniform(0, 255, (N, PC, PC)), jnp.bfloat16)
    iw = jnp.asarray(rng.uniform(0, 255, (N, WIN, WIN)), jnp.float32)
    gxw = jnp.asarray(rng.normal(0, 20, (N, WIN, WIN)), jnp.float32)
    gyw = jnp.asarray(rng.normal(0, 20, (N, WIN, WIN)), jnp.float32)
    i11 = jnp.full((N,), 1e-5, jnp.float32)
    i12 = jnp.zeros((N,), jnp.float32)
    i22 = jnp.full((N,), 1e-5, jnp.float32)
    loc0 = jnp.asarray(
        rng.uniform(R + 8, R + 9, (N, 2)).astype(np.float32))

    ms = devtime(gn_xla, compact, iw, gxw, gyw, i11, i12, i22, loc0)
    print(f"XLA    GN loop ({ITERS} it, N={N}, pc={PC}): {ms:7.2f} ms")
    try:
        out_p = gn_pallas(compact, iw, gxw, gyw, i11, i12, i22, loc0)
        out_x = gn_xla(compact, iw, gxw, gyw, i11, i12, i22, loc0)
        err = float(jnp.max(jnp.abs(out_p - out_x)))
        ms = devtime(gn_pallas, compact, iw, gxw, gyw, i11, i12, i22, loc0)
        print(f"Pallas GN loop fused:                    {ms:7.2f} ms "
              f"(max |diff| vs XLA = {err:.2e})")
    except Exception as e:
        print(f"Pallas kernel failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
