"""Batched patch gather: image [H, W] + per-point origins -> [N, ph, pw].

This is the memory-access primitive under the LK tracker and the descriptor
sampler (reference hot kernels `cv::calcOpticalFlowPyrLK`, tracker.cpp:68-69,
and `cv::ORB::detectAndCompute`'s BRIEF sampling): every per-point image
gather in the pipeline is phrased as "lift a tile-aligned patch per point,
then do dense math inside the patch". XLA lowers per-element image gathers to
a serial scalar loop on TPU (~1 s/frame measured); this kernel replaces them
with per-point HBM->VMEM DMAs issued 8-at-a-time per grid program.

Alignment contract (Mosaic tiled-memref DMA requirement):
  - origins[:, 0] (rows)  must be multiples of 8,
  - origins[:, 1] (cols)  must be multiples of 128,
  - ph a multiple of 8, pw a multiple of 128,
  - patches must lie inside the image: callers clamp origins and pad the
    image so that origin + (ph, pw) <= image shape.
Callers fold the alignment remainder into the patch-local coordinate (the
dense samplers in ops/lk.py handle arbitrary fractional offsets anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Points handled per grid program; their DMAs are issued back-to-back and
# waited together, so per-copy latency overlaps.
_PTS = 8


def _kernel_dma(origins_ref, img_ref, out_ref, sems, *, ph: int, pw: int):
    i = pl.program_id(0)
    copies = []
    for j in range(_PTS):
        y0 = pl.multiple_of(origins_ref[i * _PTS + j, 0], 8)
        x0 = pl.multiple_of(origins_ref[i * _PTS + j, 1], 128)
        cp = pltpu.make_async_copy(
            img_ref.at[pl.ds(y0, ph), pl.ds(x0, pw)], out_ref.at[j],
            sems.at[j])
        cp.start()
        copies.append(cp)
    for cp in copies:
        cp.wait()


@functools.partial(jax.jit, static_argnames=("ph", "pw"))
def _extract_pallas(image: jnp.ndarray, origins: jnp.ndarray, ph: int,
                    pw: int) -> jnp.ndarray:
    n = origins.shape[0]
    n_pad = -(-n // _PTS) * _PTS
    origins = jnp.pad(origins, ((0, n_pad - n), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // _PTS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((_PTS, ph, pw), lambda i, orig: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_PTS,))],
    )
    out = pl.pallas_call(
        functools.partial(_kernel_dma, ph=ph, pw=pw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, ph, pw), image.dtype),
    )(origins, image)
    return out[:n]


@functools.partial(jax.jit, static_argnames=("ph", "pw"))
def _extract_xla(image: jnp.ndarray, origins: jnp.ndarray, ph: int,
                 pw: int) -> jnp.ndarray:
    return jax.vmap(
        lambda o: jax.lax.dynamic_slice(image, (o[0], o[1]), (ph, pw))
    )(origins)


def extract_patches(image: jnp.ndarray, origins: jnp.ndarray, ph: int,
                    pw: int) -> jnp.ndarray:
    """Gather [N, ph, pw] patches at integer `origins` [N, 2] = (y0, x0).

    Pallas DMA kernel on TPU; plain XLA dynamic-slice batch on CPU (fast
    there, and it keeps the CPU test suite exercising identical call sites).
    Both paths are bit-identical given the alignment contract above.
    """
    if jax.default_backend() == "cpu":
        return _extract_xla(image, origins, ph, pw)
    return _extract_pallas(image, origins, ph, pw)


def aligned_origins(desired: jnp.ndarray, h_pad: int, w_pad: int,
                    ph: int, pw: int) -> jnp.ndarray:
    """Clamp desired (y, x) origins into the padded image, then align down
    to the (8, 128) DMA grid. Returns int32 [N, 2] satisfying the kernel's
    alignment contract; remainder = desired_clamped - aligned is recovered
    by the caller from these values."""
    y = jnp.clip(desired[..., 0], 0, max(h_pad - ph, 0))
    x = jnp.clip(desired[..., 1], 0, max(w_pad - pw, 0))
    return jnp.stack([(y // 8) * 8, (x // 128) * 128], -1).astype(jnp.int32)
