"""Batched pyramidal Lucas-Kanade sparse optical flow.

TPU-native replacement for `cv::calcOpticalFlowPyrLK` (reference
`tracker.cpp:68-69`, default parameters: 21x21 window, 4 pyramid levels,
iterative refinement).

Design (this is the per-frame hot path): per-point image access never uses
XLA gathers (which lower to a serial scalar loop on TPU — ~1 s/frame
measured). Instead, each pyramid level does

  1. one tile-aligned Pallas DMA gather per image lifting a patch around
     every point (`ops/pallas/patch.py`): prev [N, 48, 128] with the window +
     gradient halo, next [N, 64, 128] with +-13 px of iteration headroom
     (128-wide patches via the dual-copy pyramid — see _PW);
  2. all bilinear window sampling inside those patches as batched one-hot
     MATMULS (separable row/column weight matrices, two MXU contractions per
     sample pass) — dense, fused, zero gathers. Central differences of the
     sampled surface equal sampling the central-difference field, so gradient
     windows come from one extended (win+2)^2 prev sample;
  3. a static `lax.fori_loop` of `iters` Gauss-Newton updates against a
     once-compacted [N, 49, 49] next patch.

Status/error semantics mirror OpenCV's so the reference's filter
`status && err < tracking_error_thresh` (tracker.cpp:70-77) translates 1:1:
  - status: spatial-gradient matrix invertible, final point inside the
    image, and the iteration never drifted out of its patch headroom;
  - err: mean absolute intensity difference over the final window.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ros2_mono_vo_tpu.ops.pallas.patch import extract_patches_multi
from ros2_mono_vo_tpu.ops.sampling import (bilinear_weights, onehot_rows,
                                           sample_patch)

# Iteration drift headroom (pixels) inside the next-image patch: full-motion
# capture at the coarsest level, residual correction at finer levels (the
# compacted patch — and every per-iteration sampling matmul over it — shrinks
# with the headroom). Measured on the 25-px-translation oracle test:
# drift 5-6 at fine levels clips enough late-converging points to drop the
# good-flow fraction below OpenCV parity — 8 px is the working floor.
_DRIFT = 13
_DRIFT_FINE = 8
# Patch lane width. 128 (not 256) thanks to the dual-copy pyramid: each
# level stores the image AND a 64-column-left-shifted copy, so every <=65
# column window lies inside a 128-aligned span of one of the two (if the
# window crosses a 128 boundary in the base copy, it sits >=63 columns from
# the boundary in the shifted one). Per-point source selection rides the
# patch DMA's scalar-prefetch image index; halves the gather bytes and every
# lane-wide sampling matmul vs the single-copy 256-wide layout.
_PW = 128
_SHIFT = 64


class FlowResult(NamedTuple):
    uv: jnp.ndarray      # [N, 2] tracked (x, y) at level 0
    status: jnp.ndarray  # [N] bool
    err: jnp.ndarray     # [N] mean |dI| over the final window


def _dual(img16: jnp.ndarray) -> jnp.ndarray:
    """[H, W] -> [2, H, W]: the image plus a 64-column-left-shifted copy
    (shifted[:, x] = img[:, x + 64]; last 64 columns zero). See _PW.
    Images narrower than the shift (tiny coarse levels) never select the
    shifted copy (origins clamp to 0), so an all-zero copy is fine."""
    s = min(_SHIFT, img16.shape[1])
    shifted = jnp.pad(img16[:, s:], ((0, 0), (0, s)))
    return jnp.stack([img16, shifted])


@functools.partial(jax.jit, static_argnames=("levels",))
def build_lk_pyramid(image: jnp.ndarray, levels: int) -> tuple[jnp.ndarray, ...]:
    """Factor-2 pyramid via 2x2 average pooling (even-cropped, static shapes).

    Pooling is a (2, 2)-window reduce_window — stride-2 SLICING of an [H, W]
    image lowers to ~6 ms of strided-copy HLO on TPU, while the identical
    reduce_window runs in ~30 us (measured; same trap as lax.conv, see
    ops/features._sep_filter).

    Each level is a [2, H, W] dual: the image and its 64-column-shifted
    copy (see _PW — enables 128-wide patch DMAs). Levels are stored bf16:
    level 0 holds uint8-derived integers (EXACT in bf16's 8 significand
    bits — the final, full-resolution GN refinement sees bit-identical
    pixels), coarser levels round their 4-pixel averages at ~0.25-0.5
    intensity, below image noise and only used for the initial flow guess.
    Pooling itself accumulates in f32."""
    out = [_dual(image.astype(jnp.bfloat16))]
    img = image.astype(jnp.float32)
    for _ in range(levels - 1):
        h, w = img.shape
        img = img[: h - h % 2, : w - w % 2]
        img = jax.lax.reduce_window(img, 0.0, jax.lax.add, (2, 2), (2, 2),
                                    "VALID") * 0.25
        out.append(_dual(img.astype(jnp.bfloat16)))
    return tuple(out)


def _ceil_to(v: int, m: int) -> int:
    return -(-v // m) * m


def _dual_x(x: jnp.ndarray, need: int):
    """Pick the pyramid copy + 128-aligned DMA column origin per point.

    x: [N] int32 desired window-start columns (pre-clamped so the `need`
    columns fit the padded image). Returns (o_src, sel, o_eff): DMA start
    in the chosen copy's own coords (multiple of 128), the copy index
    (0 = base, 1 = 64-left-shifted), and the window origin in BASE coords.
    Guarantee (need <= 65): 0 <= x - o_eff <= 128 - need, so the whole
    window lies inside the 128-wide patch."""
    off = x % 128
    sel = (off > _PW - need).astype(jnp.int32)
    o_src = ((x - _SHIFT * sel) // 128) * 128
    return o_src, sel, o_src + _SHIFT * sel


@functools.partial(jax.jit,
                   static_argnames=("win", "levels", "iters", "start_level"))
def lk_track(prev_pyr: tuple[jnp.ndarray, ...], next_pyr: tuple[jnp.ndarray, ...],
             uv: jnp.ndarray, valid: jnp.ndarray,
             win: int = 21, levels: int = 4, iters: int = 10,
             init_flow: jnp.ndarray | None = None,
             start_level: int | None = None) -> FlowResult:
    """Track points `uv` [N, 2] from prev to next through the pyramids.

    Both pyramids must come from build_lk_pyramid with the same `levels`.

    `init_flow` ([N, 2], level-0 pixels) seeds the search at the predicted
    displacement instead of zero; with a good prior (e.g. landmarks
    projected under a constant-velocity pose model, tracker.track_step)
    the coarse capture levels become redundant and `start_level` can drop
    below levels-1, skipping their patch gathers and GN iterations — the
    single biggest per-frame cost cut in the tracker. Capture range around
    the prior is +-(_DRIFT * 2**start_level + _DRIFT_FINE * ...) pixels;
    a point whose prior is off by more keeps the prior at the start level
    (in_patch gate) and retries within the finer levels' headroom.
    OpenCV's pyrLK has the same two knobs (OPTFLOW_USE_INITIAL_FLOW and
    maxLevel); the reference leaves them at defaults (tracker.cpp:68-69) —
    divergence documented in SURVEY section 7.
    """
    r = win // 2
    ext = win + 2                        # window + gradient halo
    # bf16 pyramids need 16-row DMA alignment (Mosaic bf16 tile = (16, 128));
    # f32 inputs keep the 8-row grid. Alignment slack = sub - 1 rows.
    sub = 16 if prev_pyr[0].dtype == jnp.bfloat16 else 8
    ph_prev = _ceil_to(ext + 1 + sub - 1, sub)  # + bilinear tap + align slack
    min_eig_thresh = 1e-4 * (win * win)

    n = uv.shape[0]
    start = levels - 1 if start_level is None else min(start_level, levels - 1)
    if init_flow is None:
        flow = jnp.zeros_like(uv)
    else:
        flow = init_flow.astype(uv.dtype) / float(2 ** start)
    err = jnp.zeros((n,), uv.dtype)
    ok = valid

    for li in range(start, -1, -1):
        drift = _DRIFT if li == start else _DRIFT_FINE
        ph_next = _ceil_to(win + 2 * drift + 2 + sub - 1, sub)
        pc = win + 2 * drift + 2         # compacted next patch (y-slack gone)
        prev_img = prev_pyr[li]                  # [2, h, w] dual copies
        next_img = next_pyr[li]
        h, w = prev_img.shape[1:]
        hp, wp = max(_ceil_to(h, sub), ph_next), max(_ceil_to(w, 128), _PW)
        prev_p = jnp.pad(prev_img, ((0, 0), (0, hp - h), (0, wp - w)))
        next_p = jnp.pad(next_img, ((0, 0), (0, hp - h), (0, wp - w)))
        scale = float(2 ** li)
        uv_l = uv / scale

        # ---- prev: one aligned gather + one sampling pass -> ext window ----
        desy_p = (jnp.floor(uv_l[:, 1]) - (r + 1)).astype(jnp.int32)
        desx_p = (jnp.floor(uv_l[:, 0]) - (r + 1)).astype(jnp.int32)
        oy_p = (jnp.clip(desy_p, 0, max(hp - ph_prev, 0)) // sub) * sub
        ox_src_p, sel_p, ox_eff_p = _dual_x(
            jnp.clip(desx_p, 0, max(wp - (ext + 1), 0)), ext + 1)
        patches_prev = extract_patches_multi(
            prev_p, jnp.stack([oy_p, ox_src_p], -1), sel_p, ph_prev, _PW)
        local_py = uv_l[:, 1] - oy_p       # float in [r+1, r+1+sub)
        local_px = uv_l[:, 0] - ox_eff_p   # float in [r+1, r+1+(127-ext))
        offs_ext = jnp.arange(ext, dtype=uv.dtype) - (r + 1)
        # bf16 on both sampling operands: pixels are uint8-derived (exact in
        # bf16's 8 significand bits), hat-weight rounding is ~2^-8 of a
        # pixel (~0.004 px of subpixel position) — far below image noise;
        # accumulation stays f32 on the MXU (sample_patch's
        # preferred_element_type).
        wy_p = bilinear_weights(local_py[:, None] + offs_ext, ph_prev).astype(
            jnp.bfloat16)
        wx_p = bilinear_weights(local_px[:, None] + offs_ext, _PW).astype(
            jnp.bfloat16)
        ext_win = sample_patch(patches_prev, wy_p, wx_p)     # [N, ext, ext]
        iw = ext_win[:, 1:-1, 1:-1]
        gyw = 0.5 * (ext_win[:, 2:, 1:-1] - ext_win[:, :-2, 1:-1])
        gxw = 0.5 * (ext_win[:, 1:-1, 2:] - ext_win[:, 1:-1, :-2])

        # spatial gradient matrix + inverse (2x2 closed form) — computed in
        # f32 BEFORE the loop tensors narrow to bf16 below (the inverse is
        # the one quantity where gradient rounding compounds)
        a11 = jnp.sum(gxw * gxw, (-2, -1))
        a12 = jnp.sum(gxw * gyw, (-2, -1))
        a22 = jnp.sum(gyw * gyw, (-2, -1))
        det = a11 * a22 - a12 * a12
        trace = a11 + a22
        min_eig = 0.5 * (trace - jnp.sqrt(jnp.clip(trace * trace - 4 * det,
                                                   0.0, None)))
        invertible = min_eig > min_eig_thresh
        dets = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        i11, i12, i22 = a22 / dets, -a12 / dets, a11 / dets

        # The GN loop is pure HBM bandwidth on lane-padded [N, 21, *]
        # tensors (measured: per-iteration cost tracks bytes, not FLOPs) —
        # narrow every loop-resident tensor to bf16. Products quantize at
        # ~0.4%; b1/b2 still accumulate in f32 (sum dtype), and the
        # template/gradients only steer the iteration, whose fixed point is
        # where |di| is minimal on the REAL image data.
        iw = iw.astype(jnp.bfloat16)
        gxw16 = gxw.astype(jnp.bfloat16)
        gyw16 = gyw.astype(jnp.bfloat16)

        # ---- next: aligned gather + integer compaction to [N, pc, pc] ----
        guess = uv_l + flow
        desy_n = (jnp.floor(guess[:, 1]) - (r + drift)).astype(jnp.int32)
        desx_n = (jnp.floor(guess[:, 0]) - (r + drift)).astype(jnp.int32)
        oy_n = (jnp.clip(desy_n, 0, max(hp - ph_next, 0)) // sub) * sub
        used_y = jnp.clip(desy_n, 0, max(hp - pc, 0))
        used_x = jnp.clip(desx_n, 0, max(wp - pc, 0))
        ox_src_n, sel_n, ox_eff_n = _dual_x(used_x, pc)
        patches_next = extract_patches_multi(
            next_p, jnp.stack([oy_n, ox_src_n], -1), sel_n, ph_next, _PW)
        used = jnp.stack([used_y, used_x], -1)
        ry = onehot_rows(used_y - oy_n, pc, ph_next).astype(jnp.bfloat16)
        rx = onehot_rows(used_x - ox_eff_n, pc, _PW).astype(jnp.bfloat16)
        # The compact patch is re-read by every GN iteration's sampling
        # matmul — the single largest HBM stream in the tracker. bf16
        # halves it: uint8-derived pixel values are exactly representable
        # (8 significand bits cover 0..255; coarser pyramid levels round at
        # ~1 intensity LSB, below image noise), and the MXU accumulates in
        # f32 (sample_patch's preferred_element_type), so GN updates keep
        # f32 precision. The one-hot compaction operands are bf16 too (0/1
        # exact): it is the widest matmul in the tracker ([ph, 256] lanes).
        compact = sample_patch(patches_next.astype(jnp.bfloat16), ry,
                               rx).astype(jnp.bfloat16)      # [N, pc, pc]
        loc0_y = guess[:, 1] - used[:, 0]
        loc0_x = guess[:, 0] - used[:, 1]
        offs_win = jnp.arange(win, dtype=uv.dtype) - r

        def sample_next(delta):
            # hat weights quantize to bf16 (~2^-8 of a pixel per tap) —
            # far below the GN convergence scale. (Measured: merging the
            # two weight builds into one stacked [N, 2, win, pc] op makes
            # the loop 50% SLOWER — the non-minor-axis slices feeding the
            # matmuls force relayout copies. Keep the two plain builds.)
            wy = bilinear_weights(
                (loc0_y + delta[:, 1])[:, None] + offs_win, pc).astype(
                jnp.bfloat16)
            wx = bilinear_weights(
                (loc0_x + delta[:, 0])[:, None] + offs_win, pc).astype(
                jnp.bfloat16)
            return sample_patch(compact, wy, wx,
                                out_dtype=jnp.bfloat16)      # [N, win, win]

        def body(delta):
            jw = sample_next(delta)
            di = jw - iw
            b1 = jnp.sum(di * gxw16, (-2, -1), dtype=jnp.float32)
            b2 = jnp.sum(di * gyw16, (-2, -1), dtype=jnp.float32)
            dv = jnp.stack([i11 * b1 + i12 * b2, i12 * b1 + i22 * b2], -1)
            return delta - dv

        # UNROLLED (static trip count): a lax.fori_loop body of tiny batched
        # matmuls pays per-iteration loop overhead; unrolling lets XLA fuse
        # and pipeline across iterations. The error sample is only needed
        # where it is consumed (level 0). Coarse + mid levels run the full
        # `iters`: per-level iteration cuts there were measured to break
        # large-motion convergence (each mid level must hand a SUB-PIXEL
        # residual to the next or the error doubles per level — 25-px
        # oracle test drops from 100% to 79% good flow with mid levels at
        # 6 iterations). Level 0 is different: it RECEIVES a sub-pixel
        # hand-off (at most ~2x the level-1 residual) and only polishes,
        # so half the budget converges it — measured identical status
        # rates and <0.03 px flow movement on the translation/rotation
        # oracle tests vs the full budget.
        n_it = iters if li > 0 else max(3, (iters + 1) // 2)
        delta = jnp.zeros_like(flow)
        for _ in range(n_it):
            delta = body(delta)
        if li == 0:
            jw = sample_next(delta)
            err_l = jnp.mean(jnp.abs(jw - iw), (-2, -1),
                             dtype=jnp.float32)

        tracked = uv_l + flow + delta
        inside = ((tracked[:, 0] >= r) & (tracked[:, 0] < w - r)
                  & (tracked[:, 1] >= r) & (tracked[:, 1] < h - r))
        in_patch = jnp.all(jnp.abs(delta) <= drift - 1, axis=-1)
        good = valid & invertible & inside & in_patch

        # A point that wanders out at a coarse level keeps its guess and gets
        # another chance at finer levels; final status is decided at level 0.
        flow = jnp.where(good[:, None], flow + delta, flow)
        if li == 0:
            ok = valid & good
            err = err_l
        else:
            flow = flow * 2.0

    return FlowResult(uv=uv + flow, status=ok, err=err)
