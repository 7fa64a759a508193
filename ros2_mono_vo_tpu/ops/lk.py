"""Batched pyramidal Lucas-Kanade sparse optical flow.

TPU-native replacement for `cv::calcOpticalFlowPyrLK` (reference
`tracker.cpp:68-69`, default parameters: 21x21 window, 4 pyramid levels,
iterative refinement). The per-point loop becomes a vmap over fixed-capacity
point slots; the iteration count is static (`lax.fori_loop`), convergence is
monitored through the returned error instead of early exit (XLA-friendly).

Status/error semantics mirror OpenCV's so the reference's filter
`status && err < tracking_error_thresh` (tracker.cpp:70-77) translates 1:1:
  - status: point (with its window) stayed inside the image and the spatial
    gradient matrix was invertible;
  - err: mean absolute intensity difference over the final window.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ros2_mono_vo_tpu.config import FrontendConfig


class FlowResult(NamedTuple):
    uv: jnp.ndarray      # [N, 2] tracked (x, y) at level 0
    status: jnp.ndarray  # [N] bool
    err: jnp.ndarray     # [N] mean |dI| over the final window


@functools.partial(jax.jit, static_argnames=("levels",))
def build_lk_pyramid(image: jnp.ndarray, levels: int) -> tuple[jnp.ndarray, ...]:
    """Factor-2 pyramid via 2x2 average pooling (even-cropped, static shapes)."""
    out = [image]
    img = image
    for _ in range(levels - 1):
        h, w = img.shape
        img = img[: h - h % 2, : w - w % 2]
        img = (img[0::2, 0::2] + img[1::2, 0::2] + img[0::2, 1::2] + img[1::2, 1::2]) * 0.25
        out.append(img)
    return tuple(out)


def _grad(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Central-difference gradients (Scharr-free, adequate for LK)."""
    gx = 0.5 * (jnp.roll(img, -1, axis=1) - jnp.roll(img, 1, axis=1))
    gy = 0.5 * (jnp.roll(img, -1, axis=0) - jnp.roll(img, 1, axis=0))
    return gx, gy


def _sample_window(img: jnp.ndarray, center_xy: jnp.ndarray,
                   offsets: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample a window around one float center. offsets [K, 2] (dx, dy)."""
    h, w = img.shape
    x = jnp.clip(center_xy[0] + offsets[:, 0], 0.0, w - 1.001)
    y = jnp.clip(center_xy[1] + offsets[:, 1], 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
            + v10 * fy * (1 - fx) + v11 * fy * fx)


def _window_offsets(win: int) -> jnp.ndarray:
    r = win // 2
    ys, xs = jnp.mgrid[-r:r + 1, -r:r + 1]
    return jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("win", "levels", "iters"))
def lk_track(prev_pyr: tuple[jnp.ndarray, ...], next_pyr: tuple[jnp.ndarray, ...],
             uv: jnp.ndarray, valid: jnp.ndarray,
             win: int = 21, levels: int = 4, iters: int = 10) -> FlowResult:
    """Track points `uv` [N, 2] from prev to next through the pyramids.

    Both pyramids must come from build_lk_pyramid with the same `levels`.
    """
    offsets = _window_offsets(win)
    min_eig_thresh = 1e-4 * (win * win)

    n = uv.shape[0]
    flow = jnp.zeros_like(uv)
    ok = valid

    for li in range(levels - 1, -1, -1):
        prev_img = prev_pyr[li]
        next_img = next_pyr[li]
        gx, gy = _grad(prev_img)
        scale = float(2 ** li)
        uv_l = uv / scale

        def track_one(p, g, alive):
            iw = _sample_window(prev_img, p, offsets)
            gxw = _sample_window(gx, p, offsets)
            gyw = _sample_window(gy, p, offsets)
            a11 = jnp.sum(gxw * gxw)
            a12 = jnp.sum(gxw * gyw)
            a22 = jnp.sum(gyw * gyw)
            det = a11 * a22 - a12 * a12
            trace = a11 + a22
            min_eig = 0.5 * (trace - jnp.sqrt(jnp.clip(trace * trace - 4 * det, 0.0, None)))
            invertible = min_eig > min_eig_thresh
            dets = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
            i11, i12, i22 = a22 / dets, -a12 / dets, a11 / dets

            def body(_, v):
                jw = _sample_window(next_img, p + v, offsets)
                di = jw - iw
                b1 = jnp.sum(di * gxw)
                b2 = jnp.sum(di * gyw)
                dv = jnp.stack([i11 * b1 + i12 * b2, i12 * b1 + i22 * b2])
                return v - dv

            v = jax.lax.fori_loop(0, iters, body, g)
            jw = _sample_window(next_img, p + v, offsets)
            err = jnp.mean(jnp.abs(jw - iw))
            h, w = next_img.shape
            r = win // 2
            tracked = p + v
            inside = ((tracked[0] >= r) & (tracked[0] < w - r)
                      & (tracked[1] >= r) & (tracked[1] < h - r))
            good = alive & invertible & inside
            return jnp.where(good, v, g), good, err

        # A point that wanders out at a coarse level keeps its guess and gets
        # another chance at finer levels; final status is decided at level 0.
        flow, good, err = jax.vmap(track_one)(uv_l, flow, valid)
        if li == 0:
            ok = valid & good
        else:
            flow = flow * 2.0

    return FlowResult(uv=uv + flow, status=ok, err=err)
