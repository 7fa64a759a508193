"""Dense in-patch sampling helpers shared by the LK tracker and the feature
front-end.

The common idiom: per-point image access = one tile-aligned Pallas patch
gather (ops/pallas/patch.py) followed by window/point sampling expressed as
batched one-hot / bilinear-hat MATMULS. Two MXU contractions replace what
XLA would otherwise lower to serial scalar gathers (~1 s/frame measured on
the reference-sized workload).
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_weights(pos: jnp.ndarray, size: int) -> jnp.ndarray:
    """pos [..., S] float sample positions -> [..., S, size] hat weights.

    W[..., s, k] = max(0, 1 - |pos[..., s] - k|): each row holds the two
    bilinear taps; positions outside [0, size-1] produce (partially) zero
    rows, which callers either mask or pre-clip.
    """
    k = jnp.arange(size, dtype=pos.dtype)
    return jnp.clip(1.0 - jnp.abs(pos[..., None] - k), 0.0, 1.0)


def onehot_rows(start: jnp.ndarray, count: int, size: int) -> jnp.ndarray:
    """start [N] int -> [N, count, size] selection with W[n,i,k]=(k==start+i)."""
    k = jnp.arange(size, dtype=jnp.int32)
    idx = start[:, None, None] + jnp.arange(count, dtype=jnp.int32)[None, :, None]
    return (k[None, None, :] == idx).astype(jnp.float32)


def sample_patch(patch: jnp.ndarray, wy: jnp.ndarray, wx: jnp.ndarray,
                 out_dtype=None):
    """patch [N, H, W], wy [N, S, H], wx [N, T, W] -> [N, S, T].

    Contract the wide lane axis first (the big matmul), rows second.
    Accumulation is always f32 on the MXU; `out_dtype` (e.g. bf16) fuses a
    narrowing convert into the epilogue so bandwidth-bound callers halve
    the output stream.
    """
    tmp = jnp.einsum("nhw,ntw->nht", patch, wx,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("nsh,nht->nst", wy, tmp,
                     preferred_element_type=jnp.float32)
    return out if out_dtype is None else out.astype(out_dtype)


def sample_points(patch: jnp.ndarray, wy: jnp.ndarray, wx: jnp.ndarray):
    """Per-point (non-separable) bilinear samples.

    patch [N, H, W], wy [N, K, H], wx [N, K, W] -> [N, K] where sample k uses
    row weights wy[:, k] and column weights wx[:, k] (one matmul + a masked
    reduction, not K^2 cross terms).
    """
    t = jnp.einsum("nkh,nhw->nkw", wy, patch,
                   preferred_element_type=jnp.float32)
    return jnp.sum(t * wx, axis=-1)
