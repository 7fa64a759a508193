"""Batched ORB-style feature front-end as pure XLA ops + Pallas patch gathers.

TPU-native replacement for `cv::ORB::detectAndCompute` (reference
`feature_processor.cpp:12-23`): FAST-9/16 corner masks via shifted-image
algebra, Harris ranking (ORB's HARRIS_SCORE), intensity-centroid orientation,
and a steered 256-bit BRIEF-style binary descriptor — everything batched over
fixed-capacity keypoint slots with validity masks so shapes never change.

Performance notes (measured on v5e):
  - all small convolutions (Sobel, Harris window, box blur) are shift-add
    algebra, never `lax.conv` — XLA lowers single-channel convs to ~100 ms
    monsters on TPU, shifts cost microseconds;
  - per-keypoint patch access is one tile-aligned Pallas DMA gather per
    level (ops/pallas/patch.py) followed by one-hot/bilinear MATMUL sampling
    (ops/sampling.py) — zero XLA gathers anywhere;
  - corner selection uses `lax.approx_max_k` (~60x faster than full top_k on
    463k-pixel score maps, recall ~0.95 among equally-ranked corners is
    harmless for ranking features).

Divergences from OpenCV by design (parity bar is trajectory ATE, not
descriptor equality — SURVEY.md section 7 "Hard parts"):
  - the BRIEF sampling pattern is our own deterministic Gaussian pattern,
    not OpenCV's learned table;
  - FAST score is the sum-of-absolute-margins variant, with Harris used for
    the final ranking (same ranking OpenCV applies).

Descriptors are returned as +/-1 float arrays [N, 256] so Hamming distance
becomes one MXU matmul: ham = (B - a.b)/2 (see ops/matching.py).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ros2_mono_vo_tpu.config import FrontendConfig, level_feature_budget
from ros2_mono_vo_tpu.ops.pallas.patch import (extract_patches,
                                               aligned_origins)
from ros2_mono_vo_tpu.ops.sampling import (bilinear_weights, onehot_rows,
                                           sample_patch, sample_points)

# FAST-9/16 Bresenham circle of radius 3, as (drow, dcol), starting at
# 12 o'clock and going clockwise.
_FAST_CIRCLE = np.array(
    [(-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
     (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1)],
    dtype=np.int32)

_ARC_LEN = 9  # FAST-9: need 9 contiguous brighter/darker pixels

# Deterministic BRIEF-style test pattern: 256 point pairs ~ N(0, (patch/5)^2),
# clipped to the 31x31 patch. Fixed seed => identical descriptors across runs.
_PATCH_RADIUS = 15

# Patch gather geometry: a (2*_PATCH_RADIUS+1 + 4)-row window (blur halo 2)
# from an 8/128-aligned origin.
_WIN_BLUR = 2 * _PATCH_RADIUS + 1 + 4           # 35
_PH = -(-(_WIN_BLUR + 13) // 8) * 8             # 48 (13 = max clamp remainder)
_PW = 256


def _make_brief_pattern(bits: int = 256, seed: int = 20260817) -> np.ndarray:
    rng = np.random.default_rng(seed)
    sigma = (2 * _PATCH_RADIUS + 1) / 5.0
    pts = rng.normal(0.0, sigma, size=(bits, 2, 2))
    return np.clip(pts, -(_PATCH_RADIUS - 2), _PATCH_RADIUS - 2).astype(np.float32)


_BRIEF_PATTERN = _make_brief_pattern()


class Features(NamedTuple):
    """Fixed-capacity feature set (replaces the reference's
    std::vector<Observation>, frame.hpp:10-20, with masked slots)."""

    uv: jnp.ndarray        # [N, 2] (x, y) pixel coords at level 0 scale
    response: jnp.ndarray  # [N] Harris response used for ranking
    angle: jnp.ndarray     # [N] orientation in radians
    level: jnp.ndarray     # [N] int32 pyramid level
    desc: jnp.ndarray      # [N, B] float32 in {-1, +1}
    valid: jnp.ndarray     # [N] bool


def build_pyramid(image: jnp.ndarray, num_levels: int, scale: float) -> list[jnp.ndarray]:
    """Image pyramid with geometric rescale (cv::ORB scaleFactor semantics).

    Uses bilinear resize per level from level 0 (matches OpenCV's
    INTER_LINEAR resize chain closely enough for ATE parity).
    """
    h, w = image.shape
    levels = [image]
    for i in range(1, num_levels):
        hi = max(int(round(h / scale ** i)), 16)
        wi = max(int(round(w / scale ** i)), 16)
        levels.append(jax.image.resize(image, (hi, wi), method="bilinear"))
    return levels


def _shift2d(img: jnp.ndarray, dr: int, dc: int) -> jnp.ndarray:
    """Shift so out[r, c] = img[r + dr, c + dc] (border wraps; borders are
    masked out downstream)."""
    return jnp.roll(img, shift=(-dr, -dc), axis=(0, 1))


def fast_corner_score(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """FAST-9/16 corner score map.

    Returns [H, W]: 0 for non-corners, else the sum of absolute margins
    |circle - center| - t over the out-of-band circle pixels.
    """
    center = img
    circle = jnp.stack([_shift2d(img, int(dr), int(dc)) for dr, dc in _FAST_CIRCLE])
    bright = circle > (center + threshold)[None]
    dark = circle < (center - threshold)[None]

    def has_arc(mask16):
        # mask16: [16, H, W] bool. Check any window of 9 contiguous (cyclic)
        # by binary doubling over the circle axis: m2[s] = runs of 2 starting
        # at s, m4 of 4, m8 of 8, m9[s] = m8[s] & m[s+8]. 4 stacked passes +
        # one reduce instead of 16x8 per-start ANDs (~2x fewer map passes
        # over the full-resolution score map).
        m = mask16
        m2 = m & jnp.roll(m, -1, axis=0)
        m4 = m2 & jnp.roll(m2, -2, axis=0)
        m8 = m4 & jnp.roll(m4, -4, axis=0)
        m9 = m8 & jnp.roll(m, -8, axis=0)
        return jnp.any(m9, axis=0)

    is_corner = has_arc(bright) | has_arc(dark)
    margin = jnp.abs(circle - center[None]) - threshold
    score = jnp.sum(jnp.where(bright | dark, margin, 0.0), axis=0)
    return jnp.where(is_corner, score, 0.0)


def _sep_filter(img: jnp.ndarray, row_taps, col_taps) -> jnp.ndarray:
    """Separable filter as shift-adds (rows then cols); taps are centered.

    NEVER use lax.conv for these: XLA lowers single-channel 2D convs to
    ~100 ms per call on TPU; the equivalent shifts run in microseconds.
    """
    r_half = (len(row_taps) - 1) // 2
    c_half = (len(col_taps) - 1) // 2
    out = None
    for i, t in enumerate(row_taps):
        if t == 0.0:
            continue
        term = _shift2d(img, i - r_half, 0) * t
        out = term if out is None else out + term
    img = out
    out = None
    for j, t in enumerate(col_taps):
        if t == 0.0:
            continue
        term = _shift2d(img, 0, j - c_half) * t
        out = term if out is None else out + term
    return out


def harris_response(img: jnp.ndarray, k: float = 0.04) -> jnp.ndarray:
    """Harris corner response (ORB's keypoint ranking score)."""
    # Sobel/8 = smooth [1,2,1]/1 x diff [-1,0,1]/1, scaled by 1/8
    gx = _sep_filter(img, (0.125, 0.25, 0.125), (-0.5, 0.0, 0.5))
    gy = _sep_filter(img, (-0.5, 0.0, 0.5), (0.125, 0.25, 0.125))
    box7 = (1.0,) * 7
    sxx = _sep_filter(gx * gx, box7, box7)
    syy = _sep_filter(gy * gy, box7, box7)
    sxy = _sep_filter(gx * gy, box7, box7)
    det = sxx * syy - sxy * sxy
    trace = sxx + syy
    return det - k * trace * trace


def _nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    """Keep local maxima of a 3x3 neighborhood.

    Shift-max algebra, NOT reduce_window: the overlapping (3,3)/stride-1
    window lowers to a 0.7 ms kernel on the level-0 map while eight
    shift+max ops fuse into microseconds (same trap as lax.conv)."""
    m = score
    for dr, dc in ((-1, -1), (-1, 0), (-1, 1), (0, -1),
                   (0, 1), (1, -1), (1, 0), (1, 1)):
        m = jnp.maximum(m, _shift2d(score, dr, dc))
    return jnp.where((score >= m) & (score > 0.0), score, 0.0)


def _box_blur5(img: jnp.ndarray) -> jnp.ndarray:
    """5x5 box blur (ORB smooths the image before BRIEF sampling)."""
    t = (0.2,) * 5
    return _sep_filter(img, t, t)


def _extract_patches(img: jnp.ndarray, rc: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Gather square patches [(2r+1)^2] around integer centers rc [N, 2].

    Centers are clamped inside the image; callers mask border keypoints.
    (Oracle-test helper — the production path goes through
    ops/pallas/patch.extract_patches + matmul sampling.)
    """
    h, w = img.shape
    size = 2 * radius + 1
    pad = radius + 1
    padded = jnp.pad(img, pad, mode="edge")

    def one(center):
        r = jnp.clip(center[0], 0, h - 1) + pad - radius
        c = jnp.clip(center[1], 0, w - 1) + pad - radius
        return jax.lax.dynamic_slice(padded, (r, c), (size, size))

    return jax.vmap(one)(rc)


def orientation_from_patches(patches: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation: atan2(m01, m10) over a circular mask.

    patches: [N, S, S] with S = 2 * _PATCH_RADIUS + 1.
    """
    s = patches.shape[-1]
    r = (s - 1) // 2
    ys, xs = np.mgrid[-r:r + 1, -r:r + 1].astype(np.float32)
    circ = ((xs ** 2 + ys ** 2) <= r ** 2).astype(np.float32)
    m10 = jnp.sum(patches * (xs * circ), axis=(-2, -1))
    m01 = jnp.sum(patches * (ys * circ), axis=(-2, -1))
    return jnp.arctan2(m01, m10)


def steered_brief(patches: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """Steered BRIEF descriptors from blurred patches.

    patches: [N, S, S]; angles: [N]. Returns [N, 256] float32 in {-1, +1}.
    Sampling = bilinear-hat matmuls (sample_points), no gathers; rotated
    test points are clamped into the patch exactly like the scalar version.
    """
    s = patches.shape[-1]
    center = (s - 1) / 2.0
    pattern = jnp.asarray(_BRIEF_PATTERN)  # [256, 2, 2] (pair, point, (x, y))
    # flatten to 512 test points: [p1 of all pairs, then p2 of all pairs]
    x = jnp.concatenate([pattern[:, 0, 0], pattern[:, 1, 0]])
    y = jnp.concatenate([pattern[:, 0, 1], pattern[:, 1, 1]])
    ca, sa = jnp.cos(angles)[:, None], jnp.sin(angles)[:, None]
    pc = jnp.clip(center + ca * x - sa * y, 0.0, s - 1.001)   # cols  [N, 512]
    pr = jnp.clip(center + sa * x + ca * y, 0.0, s - 1.001)   # rows
    wy = bilinear_weights(pr, s)
    wx = bilinear_weights(pc, s)
    v = sample_points(patches, wy, wx)                         # [N, 512]
    b = v.shape[-1] // 2
    return jnp.where(v[:, :b] < v[:, b:], 1.0, -1.0).astype(jnp.float32)


def _topk_scores(flat: jnp.ndarray, k: int):
    """Top-k on a large score map: approx_max_k on TPU (fast bitonic
    partial), exact top_k elsewhere (CPU tests stay deterministic)."""
    if jax.default_backend() == "cpu":
        return jax.lax.top_k(flat, k)
    return jax.lax.approx_max_k(flat, k)


def _detect_level(img: jnp.ndarray, budget: int, cfg: FrontendConfig):
    """Detect top-`budget` corners on one pyramid level.

    Returns (rc [budget, 2] int32, response [budget], valid [budget]).
    """
    # Corner scoring runs in bf16: ~30 elementwise passes over the level
    # map are pure bandwidth and pixel values are uint8-derived
    # (bf16-exact). Caveats (ADVICE round-4 #3): Harris' det =
    # sxx*syy - sxy^2 CANCELS near edges, so bf16 rounding (~0.4% per
    # product) yields absolute response errors much larger than 0.4% of
    # small responses — weak/edge-like corners can reorder, not just
    # near-equal ones — and bf16 FAST-score quantization makes NMS ties
    # (duplicate adjacent corners) more likely. Both only perturb WHICH
    # corners are selected; the ATE-parity gate in bench.py is the
    # guardrail that this never costs trajectory accuracy. The describe
    # path keeps f32.
    img16 = img.astype(jnp.bfloat16)
    score = fast_corner_score(img16, cfg.fast_threshold)
    score = _nms3x3(score)
    harris = harris_response(img16).astype(jnp.float32)
    # rank FAST survivors by Harris response (strictly negative fill)
    margin = cfg.patch_size // 2 + 1
    h, w = img.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = ((rows >= margin) & (rows < h - margin)
              & (cols >= margin) & (cols < w - margin))
    ranked = jnp.where((score > 0.0) & inside, harris, -jnp.inf)
    # Materialization fence: without it XLA fuses the flattening reshape
    # into the ~50-op score chain above and the whole chain runs at the
    # flat layout — measured 5.8 -> 2.8 ms for the 8-level detect at S=2
    # (the reshape relayouts [H, W] tiles to a 1-D lane order).
    ranked = jax.lax.optimization_barrier(ranked)
    flat = ranked.reshape(-1)
    top, idx = _topk_scores(flat, budget)
    rc = jnp.stack([idx // w, idx % w], axis=-1)
    valid = jnp.isfinite(top)
    return rc, jnp.where(valid, top, 0.0), valid


def _describe_level(img: jnp.ndarray, rc: jnp.ndarray):
    """Orientation + steered BRIEF for integer keypoints rc [N, 2] = (r, c).

    One aligned Pallas gather of a [_PH, _PW] patch per keypoint, then the
    35x35 blur-halo window is lifted with one-hot matmuls, box-blurred with a
    banded matmul, and BRIEF-sampled with bilinear-hat matmuls.
    """
    h, w = img.shape
    hp = -(-h // 8) * 8 + 16
    wp = max(-(-w // 128) * 128 + 128, _PW)
    imgp = jnp.pad(img, ((0, hp - h), (0, wp - w)))
    half = _WIN_BLUR // 2  # 17
    des = rc - half
    o = aligned_origins(des, hp, wp, _PH, _PW)
    patches = extract_patches(imgp, o, _PH, _PW)              # [N, 48, 256]
    ry = onehot_rows(des[:, 0] - o[:, 0], _WIN_BLUR, _PH)
    rx = onehot_rows(des[:, 1] - o[:, 1], _WIN_BLUR, _PW)
    win35 = sample_patch(patches, ry, rx)                     # [N, 35, 35]
    win31 = win35[:, 2:-2, 2:-2]
    angles = orientation_from_patches(win31)
    # 5x5 box blur of the interior as a banded matmul: B [31, 35]
    s31 = 2 * _PATCH_RADIUS + 1
    band = np.zeros((s31, _WIN_BLUR), np.float32)
    for i in range(s31):
        band[i, i:i + 5] = 0.2
    B = jnp.asarray(band)
    blurred = jnp.einsum("ih,nhw,jw->nij", B, win35, B,
                         preferred_element_type=jnp.float32)  # [N, 31, 31]
    desc = steered_brief(blurred, angles)
    return angles, desc


@functools.partial(jax.jit, static_argnames=("cfg",))
def detect_and_describe(image: jnp.ndarray, cfg: FrontendConfig) -> Features:
    """Full ORB-style detect + describe over the image pyramid.

    Args:
      image: [H, W] float32 grayscale in [0, 255].
      cfg: static FrontendConfig (shapes derive from it).

    Returns:
      Features with exactly cfg.max_features slots (masked).
    """
    levels = build_pyramid(image, cfg.num_pyramid_levels, cfg.pyramid_scale)
    budgets = level_feature_budget(cfg)

    uv_all, resp_all, ang_all, lvl_all, desc_all, valid_all = [], [], [], [], [], []
    for li, (img, budget) in enumerate(zip(levels, budgets)):
        if budget == 0:
            continue
        rc, resp, valid = _detect_level(img, budget, cfg)
        angles, desc = _describe_level(img, rc)
        scale = cfg.pyramid_scale ** li
        uv = jnp.stack([rc[:, 1].astype(jnp.float32) * scale,
                        rc[:, 0].astype(jnp.float32) * scale], axis=-1)
        uv_all.append(uv)
        resp_all.append(resp)
        ang_all.append(angles)
        lvl_all.append(jnp.full((budget,), li, jnp.int32))
        desc_all.append(desc)
        valid_all.append(valid)

    return Features(
        uv=jnp.concatenate(uv_all),
        response=jnp.concatenate(resp_all),
        angle=jnp.concatenate(ang_all),
        level=jnp.concatenate(lvl_all),
        desc=jnp.concatenate(desc_all),
        valid=jnp.concatenate(valid_all),
    )


def occupancy_grid_check(uv: jnp.ndarray, valid: jnp.ndarray,
                         image_shape: tuple[int, int],
                         grid_div: int, thresh: float):
    """Keypoint-distribution gate (reference `initializer.cpp:52-75`):
    fraction of occupied grid cells must exceed `thresh`.

    Returns (ok scalar bool, occupancy scalar f32).
    """
    h, w = image_shape
    gh, gw = h // grid_div, w // grid_div
    r = jnp.clip((uv[:, 1] // grid_div).astype(jnp.int32), 0, gh - 1)
    c = jnp.clip((uv[:, 0] // grid_div).astype(jnp.int32), 0, gw - 1)
    grid = jnp.zeros((gh, gw), jnp.float32)
    grid = grid.at[r, c].max(valid.astype(jnp.float32))
    occupancy = jnp.sum(grid) / float(gh * gw)
    return occupancy > thresh, occupancy


def pack_descriptors(desc_pm1: jnp.ndarray) -> np.ndarray:
    """Pack +/-1 float descriptors [N, B] into uint8 [N, B//8] (host-side
    helper for OpenCV-oracle tests and compact map storage)."""
    bits = (np.asarray(desc_pm1) > 0).astype(np.uint8)
    return np.packbits(bits, axis=-1)
