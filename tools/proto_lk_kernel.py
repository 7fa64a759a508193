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
    compact = compact_ref[:]                        # [PB, PC, PC] bf16
    iw = iw_ref[:]                                  # [PB, WIN, WIN] f32
    gxw = gxw_ref[:]
    gyw = gyw_ref[:]
    i11 = inv_ref[:, 0]
    i12 = inv_ref[:, 1]
    i22 = inv_ref[:, 2]
    locx = loc_ref[:, 0]
    locy = loc_ref[:, 1]
    offs = jax.lax.broadcasted_iota(
        jnp.int32, (1, WIN, 1), 1).astype(jnp.float32) - R   # [1, WIN, 1]
    k = jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, PC), 2).astype(jnp.float32)        # [1, 1, PC]

    delta = jnp.zeros((PB, 2), jnp.float32)

    for _ in range(ITERS):
        posy = locy[:, None, None] + delta[:, 1][:, None, None] + offs
        posx = locx[:, None, None] + delta[:, 0][:, None, None] + offs
        wy = jnp.clip(1.0 - jnp.abs(posy - k), 0.0, 1.0).astype(jnp.bfloat16)
        wx = jnp.clip(1.0 - jnp.abs(posx - k), 0.0, 1.0).astype(jnp.bfloat16)
        tmp = jax.lax.dot_general(
            compact, wx, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)     # [PB, PC, WIN]
        jw = jax.lax.dot_general(
            wy, tmp, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)     # [PB, WIN, WIN]
        di = jw - iw
        b1 = jnp.sum(di * gxw, (-2, -1))
        b2 = jnp.sum(di * gyw, (-2, -1))
        dv = jnp.stack([i11 * b1 + i12 * b2, i12 * b1 + i22 * b2], -1)
        delta = delta - dv
    out_ref[:] = delta


@jax.jit
def gn_pallas(compact, iw, gxw, gyw, i11, i12, i22, loc0):
    inv = jnp.stack([i11, i12, i22], -1)
    grid = N // PB
    return pl.pallas_call(
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
            pl.BlockSpec((PB, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((PB, 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 2), jnp.float32),
    )(compact, iw, gxw, gyw, inv, loc0)


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
