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
# waited together, so per-copy latency overlaps. 16 in-flight copies per
# program measured faster than 8 on the per-point ~25-60 KB patches of the
# LK/ORB paths (DMA issue overhead amortizes; VMEM footprint stays small).
_PTS = 16


def _kernel_dma_b(origins_ref, img_ref, out_ref, sems, *, ph: int, pw: int):
    """origins_ref: [3, n_pad] int32 in SMEM, rows = (image idx, y0, x0).

    Transposed layout is load-bearing: SMEM prefetch operands pad the MINOR
    dimension to 128, so [n, 3] would allocate n x 128 words (2 MiB at
    n=4096 — over the 1 MiB SMEM budget) while [3, n] stays at 3 x n."""
    i = pl.program_id(0)
    copies = []
    for j in range(_PTS):
        b = origins_ref[0, i * _PTS + j]
        y0 = pl.multiple_of(origins_ref[1, i * _PTS + j], 8)
        x0 = pl.multiple_of(origins_ref[2, i * _PTS + j], 128)
        cp = pltpu.make_async_copy(
            img_ref.at[b, pl.ds(y0, ph), pl.ds(x0, pw)], out_ref.at[j],
            sems.at[j])
        cp.start()
        copies.append(cp)
    for cp in copies:
        cp.wait()


@functools.partial(jax.jit, static_argnames=("ph", "pw"))
def _extract_pallas_flat(images: jnp.ndarray, borg: jnp.ndarray,
                         ph: int, pw: int) -> jnp.ndarray:
    """images [M, H, W], borg [K, 3] rows (image idx, y0, x0) -> [K, ph, pw].

    One flat grid over all K patches; each DMA reads from its own image via
    a scalar-prefetched image index."""
    total = borg.shape[0]
    n_pad = -(-total // _PTS) * _PTS
    borg = jnp.pad(borg, ((0, n_pad - total), (0, 0))).T   # [3, n_pad]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // _PTS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((_PTS, ph, pw), lambda i, orig: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_PTS,))],
    )
    out = pl.pallas_call(
        functools.partial(_kernel_dma_b, ph=ph, pw=pw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, ph, pw), images.dtype),
    )(borg, images)
    return out[:total]


@functools.partial(jax.jit, static_argnames=("ph", "pw"))
def _extract_pallas_batched(images: jnp.ndarray, origins: jnp.ndarray,
                            ph: int, pw: int) -> jnp.ndarray:
    """images [B, H, W], origins [B, N, 2] -> [B, N, ph, pw].

    This is THE batched form — a vmap of a single-image pallas_call lowers
    to something ~5000x slower (measured 452 ms vs 0.09 ms at B=8, N=512,
    56x256 patches)."""
    B, n = origins.shape[:2]
    bidx = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None, None], (B, n, 1))
    borg = jnp.concatenate([bidx, origins], -1).reshape(B * n, 3)
    out = _extract_pallas_flat(images, borg, ph, pw)
    return out.reshape(B, n, ph, pw)


@functools.partial(jax.jit, static_argnames=("ph", "pw"))
def _extract_xla(image: jnp.ndarray, origins: jnp.ndarray, ph: int,
                 pw: int) -> jnp.ndarray:
    return jax.vmap(
        lambda o: jax.lax.dynamic_slice(image, (o[0], o[1]), (ph, pw))
    )(origins)


@functools.lru_cache(maxsize=None)
def _extractor(ph: int, pw: int):
    """Shape-specialized extractor with a custom vmap rule: batching maps
    onto the flat batched kernel instead of vmapping the pallas_call."""

    @jax.custom_batching.custom_vmap
    def ex(image, origins):
        if jax.default_backend() == "cpu":
            return _extract_xla(image, origins, ph, pw)
        return _extract_pallas_batched(image[None], origins[None], ph, pw)[0]

    @ex.def_vmap
    def ex_vmap(axis_size, in_batched, images, origins):
        img_b, org_b = in_batched
        if not img_b:
            images = jnp.broadcast_to(images, (axis_size,) + images.shape)
        if not org_b:
            origins = jnp.broadcast_to(origins,
                                       (axis_size,) + origins.shape)
        if jax.default_backend() == "cpu":
            out = jax.vmap(lambda im, o: _extract_xla(im, o, ph, pw))(
                images, origins)
        else:
            out = _extract_pallas_batched(images, origins, ph, pw)
        return out, True

    return ex


def extract_patches(image: jnp.ndarray, origins: jnp.ndarray, ph: int,
                    pw: int) -> jnp.ndarray:
    """Gather [N, ph, pw] patches at integer `origins` [N, 2] = (y0, x0).

    Pallas DMA kernel on TPU; plain XLA dynamic-slice batch on CPU (fast
    there, and it keeps the CPU test suite exercising identical call sites).
    Both paths are bit-identical given the alignment contract above.

    Under `jax.vmap` this dispatches to the natively batched kernel (one
    flat DMA grid over all lanes) via a custom batching rule — the batched
    VO engine's per-frame cost lives and dies on this.
    """
    return _extractor(ph, pw)(image, origins)


@functools.partial(jax.jit, static_argnames=("ph", "pw"))
def _extract_xla_multi(images: jnp.ndarray, origins: jnp.ndarray,
                       src: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    return jax.vmap(
        lambda o, s: jax.lax.dynamic_slice(
            images, (s, o[0], o[1]), (1, ph, pw))[0]
    )(origins, src)


@functools.lru_cache(maxsize=None)
def _extractor_multi(ph: int, pw: int):
    """Shape-specialized multi-source extractor: each point picks its source
    image by index (e.g. the base vs 64-col-shifted pyramid copy in
    ops/lk.py). Custom vmap flattens (lane, src) into one flat image batch
    so the whole lane batch is one DMA grid."""

    @jax.custom_batching.custom_vmap
    def ex(images, origins, src):
        if jax.default_backend() == "cpu":
            return _extract_xla_multi(images, origins, src, ph, pw)
        borg = jnp.concatenate(
            [src[:, None].astype(jnp.int32), origins], -1)
        return _extract_pallas_flat(images, borg, ph, pw)

    @ex.def_vmap
    def ex_vmap(axis_size, in_batched, images, origins, src):
        img_b, org_b, src_b = in_batched
        if not img_b:
            images = jnp.broadcast_to(images, (axis_size,) + images.shape)
        if not org_b:
            origins = jnp.broadcast_to(origins,
                                       (axis_size,) + origins.shape)
        if not src_b:
            src = jnp.broadcast_to(src, (axis_size,) + src.shape)
        A, M = images.shape[:2]
        n = origins.shape[1]
        if jax.default_backend() == "cpu":
            out = jax.vmap(
                lambda im, o, s: _extract_xla_multi(im, o, s, ph, pw)
            )(images, origins, src)
        else:
            flat_imgs = images.reshape((A * M,) + images.shape[2:])
            src_flat = (src.astype(jnp.int32)
                        + M * jnp.arange(A, dtype=jnp.int32)[:, None])
            borg = jnp.concatenate(
                [src_flat.reshape(A * n, 1), origins.reshape(A * n, 2)], -1)
            out = _extract_pallas_flat(flat_imgs, borg, ph, pw)
            out = out.reshape(A, n, ph, pw)
        return out, True

    return ex


def extract_patches_multi(images: jnp.ndarray, origins: jnp.ndarray,
                          src: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    """Gather [N, ph, pw] patches at integer `origins` [N, 2] = (y0, x0),
    each from `images[src[n]]` (images [M, H, W], src [N] int32).

    Same alignment contract and TPU/CPU dispatch as extract_patches; the
    per-point source index rides the same scalar-prefetch word the batched
    kernel already uses for lane indices."""
    return _extractor_multi(ph, pw)(images, origins, src)


def aligned_origins(desired: jnp.ndarray, h_pad: int, w_pad: int,
                    ph: int, pw: int, sub: int = 8) -> jnp.ndarray:
    """Clamp desired (y, x) origins into the padded image, then align down
    to the (sub, 128) DMA grid — sub = 8 for f32 tiles, 16 for bf16
    (Mosaic tiled-memref sublane granularity per dtype). Returns int32
    [N, 2] satisfying the kernel's alignment contract; remainder =
    desired_clamped - aligned is recovered by the caller from these
    values."""
    y = jnp.clip(desired[..., 0], 0, max(h_pad - ph, 0))
    x = jnp.clip(desired[..., 1], 0, max(w_pad - pw, 0))
    return jnp.stack([(y // sub) * sub, (x // 128) * 128],
                     -1).astype(jnp.int32)
