"""Synthetic multi-plane scene renderer with exact ground truth.

The reference has no tests; SURVEY.md section 4 prescribes integration tests
on "synthetic scenes (random 3D points + scripted camera)". This renderer
produces trackable textured images from exact camera poses: a stack of
textured fronto-parallel planes at different depths (depth diversity gives
the parallax the H/F model-selection gate needs). Pure NumPy — it feeds the
pipeline from the host like a dataset reader would.
"""

from __future__ import annotations

import numpy as np


def _make_texture(rng: np.random.Generator, size: int = 768,
                  n_rects: int = 400, base: float = 40.0) -> np.ndarray:
    tex = np.full((size, size), base, np.float32)
    for _ in range(n_rects):
        r0 = int(rng.integers(0, size - 8))
        c0 = int(rng.integers(0, size - 8))
        h = int(rng.integers(6, 40))
        w = int(rng.integers(6, 40))
        tex[r0:r0 + h, c0:c0 + w] = float(rng.uniform(60, 250))
    return tex


class SyntheticScene:
    """Textured planes z = d_i (world frame), rendered by ray casting.

    World frame == first camera frame (CV axes: z forward).
    """

    def __init__(self, rng: np.random.Generator,
                 image_shape: tuple[int, int] = (240, 320),
                 K: np.ndarray | None = None,
                 depths: tuple[float, ...] = (8.0, 14.0, 26.0),
                 extents: tuple[float, ...] = (7.0, 14.0, 30.0),
                 tex_size: int = 768):
        h, w = image_shape
        if K is None:
            f = 0.9 * w
            K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
        self.K = K.astype(np.float32)
        self.image_shape = image_shape
        self.depths = depths
        self.extents = extents
        self.textures = [_make_texture(rng, tex_size) for _ in depths]
        # each plane covers a band of the world so nearer planes don't fully
        # occlude farther ones: plane i visible where (x + y) mod 3 == i band
        self.tex_size = tex_size
        # pixel grid rays (homogeneous)
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        ones = np.ones_like(xs)
        pix = np.stack([xs, ys, ones], axis=-1)  # [h, w, 3]
        self.rays_cam = pix @ np.linalg.inv(self.K).T  # [h, w, 3]

    def render(self, T_wc: np.ndarray) -> np.ndarray:
        """Render from camera pose T_wc (world <- camera)."""
        h, w = self.image_shape
        R = T_wc[:3, :3].astype(np.float32)
        t = T_wc[:3, 3].astype(np.float32)
        dirs = self.rays_cam @ R.T            # [h, w, 3] world ray dirs
        out = np.zeros((h, w), np.float32)
        filled = np.zeros((h, w), bool)
        # near-to-far: first hit wins
        order = np.argsort(self.depths)
        for i in order:
            d = self.depths[i]
            ext = self.extents[i]
            dz = dirs[..., 2]
            lam = (d - t[2]) / np.where(np.abs(dz) < 1e-6, 1e-6, dz)
            ok = lam > 0.1
            x = t[0] + lam * dirs[..., 0]
            y = t[1] + lam * dirs[..., 1]
            inside = ok & (np.abs(x) < ext) & (np.abs(y) < ext)
            # checker bands make each plane visible in parts of the image
            band = ((np.floor(x / (0.45 * ext)) + np.floor(y / (0.45 * ext)))
                    .astype(np.int64) % len(self.depths)) == i
            hit = inside & band & ~filled
            ts = self.tex_size
            u = ((x / ext) * 0.5 + 0.5) * (ts - 2)
            v = ((y / ext) * 0.5 + 0.5) * (ts - 2)
            u0 = np.clip(u.astype(np.int64), 0, ts - 2)
            v0 = np.clip(v.astype(np.int64), 0, ts - 2)
            fu = (u - u0).astype(np.float32)
            fv = (v - v0).astype(np.float32)
            tex = self.textures[i]
            val = (tex[v0, u0] * (1 - fv) * (1 - fu) + tex[v0, u0 + 1] * (1 - fv) * fu
                   + tex[v0 + 1, u0] * fv * (1 - fu) + tex[v0 + 1, u0 + 1] * fv * fu)
            out = np.where(hit, val, out)
            filled |= hit
        return out

    def raycast(self, T_wc: np.ndarray, uv: np.ndarray):
        """Exact 3D world point hit by each pixel ray (same plane/band logic
        as render). uv: [N, 2] (x, y) pixels. Returns (xyz [N, 3], valid [N]).

        Ground-truth oracle for stage-by-stage accuracy diffs: GT optical
        flow is raycast(T_a, uv) projected into camera b; GT landmark depth
        is the returned z in camera frame."""
        R = T_wc[:3, :3].astype(np.float64)
        t = T_wc[:3, 3].astype(np.float64)
        pix = np.concatenate([uv, np.ones_like(uv[:, :1])], -1)
        dirs = (pix @ np.linalg.inv(self.K).T) @ R.T       # [N, 3] world
        xyz = np.zeros((len(uv), 3))
        filled = np.zeros(len(uv), bool)
        for i in np.argsort(self.depths):
            d, ext = self.depths[i], self.extents[i]
            dz = dirs[:, 2]
            lam = (d - t[2]) / np.where(np.abs(dz) < 1e-6, 1e-6, dz)
            x = t[0] + lam * dirs[:, 0]
            y = t[1] + lam * dirs[:, 1]
            inside = (lam > 0.1) & (np.abs(x) < ext) & (np.abs(y) < ext)
            band = ((np.floor(x / (0.45 * ext)) + np.floor(y / (0.45 * ext)))
                    .astype(np.int64) % len(self.depths)) == i
            hit = inside & band & ~filled
            xyz[hit] = np.stack([x, y, np.full_like(x, d)], -1)[hit]
            filled |= hit
        return xyz, filled

    def camera_path(self, n_frames: int, step: float = 0.12,
                    lateral: float = 0.02, yaw_rate: float = 0.002) -> list[np.ndarray]:
        """Scripted forward-dominant trajectory (T_wc per frame)."""
        poses = []
        for i in range(n_frames):
            yaw = yaw_rate * i
            c, s = np.cos(yaw), np.sin(yaw)
            R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
            t = np.array([lateral * i, 0.004 * i, step * i], np.float32)
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = R
            T[:3, 3] = t
            poses.append(T)
        return poses

    def loop_path(self, n_frames: int, radius: float = 2.0,
                  revisit_frames: int = 6) -> list[np.ndarray]:
        """Closed loop in the x-y plane (camera keeps facing +z so every
        frame sees the textured planes): the trajectory circles back to the
        start and re-traverses the first arc for `revisit_frames` frames —
        the revisit that loop closure must discover."""
        poses = []
        total = n_frames - revisit_frames
        for i in range(n_frames):
            th = 2 * np.pi * (i % total) / total
            T = np.eye(4, dtype=np.float32)
            T[:3, 3] = [radius * np.sin(th), radius * (1 - np.cos(th)) * 0.6, 0.0]
            poses.append(T)
        return poses

    def render_sequence(self, poses: list[np.ndarray]) -> list[np.ndarray]:
        return [self.render(T) for T in poses]
