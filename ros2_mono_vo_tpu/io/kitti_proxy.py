"""KITTI-statistics proxy scene: textured street corridor with exact GT.

VERDICT round-2 item #4: the bench must run on KITTI-like frames — real
photographic texture statistics, ground-plane + forward motion, 1241x376 —
not the friendly fronto-parallel plane stack (io/synthetic.py), whose
camera eventually flies through its own geometry.

This renderer models the KITTI street geometry analytically:

  - a ground plane under the camera (KITTI camera height ~1.65 m),
  - building facades left and right of the road,
  - the corridor is INFINITE along z (textures tile), so arbitrarily long
    forward trajectories never degenerate — the benchmark measures drift,
    not collision behavior.

Texture is multi-octave value noise (1/f spectrum — the textbook model of
natural-image statistics) with added fine speckle so corner detectors find
KITTI-like feature densities at all scales. Pure NumPy; zero-egress safe.

`raycast` returns the exact 3D hit point per pixel — the same ground-truth
oracle surface as SyntheticScene (used by tools/oracle_diff.py).
"""

from __future__ import annotations

import numpy as np


def _value_noise(rng: np.random.Generator, size: int, octaves: int = 6,
                 persistence: float = 0.55) -> np.ndarray:
    """Tileable multi-octave value noise in [0, 1], [size, size]."""
    out = np.zeros((size, size), np.float32)
    amp = 1.0
    total = 0.0
    for o in range(octaves):
        n = 4 * (2 ** o)
        if n > size:
            break
        grid = rng.uniform(0, 1, (n, n)).astype(np.float32)
        # tileable bilinear upsample to [size, size]
        reps = size // n
        ys = (np.arange(size, dtype=np.float32) / reps)
        xs = ys
        y0 = ys.astype(np.int64) % n
        x0 = xs.astype(np.int64) % n
        fy = (ys - np.floor(ys))[:, None]
        fx = (xs - np.floor(xs))[None, :]
        y1 = (y0 + 1) % n
        x1 = (x0 + 1) % n
        layer = (grid[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
                 + grid[np.ix_(y0, x1)] * (1 - fy) * fx
                 + grid[np.ix_(y1, x0)] * fy * (1 - fx)
                 + grid[np.ix_(y1, x1)] * fy * fx)
        out += amp * layer
        total += amp
        amp *= persistence
    out /= total
    return out


def _street_texture(rng: np.random.Generator, size: int,
                    speckle: float = 0.35, contrast: float = 150.0,
                    base: float = 70.0, n_patches: int = 1200) -> np.ndarray:
    """Natural-statistics texture: 1/f noise + fine speckle + hard-edged
    patches (windows/markings/shadows — the step edges that give streets
    their corner density), 8-bit range."""
    t = _value_noise(rng, size)
    spec = rng.uniform(-1, 1, (size, size)).astype(np.float32)
    t = t + speckle * 0.5 * spec * t  # multiplicative fine detail
    t = base + contrast * (t - t.mean())
    for _ in range(n_patches):
        r0 = int(rng.integers(0, size - 6))
        c0 = int(rng.integers(0, size - 6))
        hh = int(rng.integers(4, 48))
        ww = int(rng.integers(4, 48))
        gain = float(rng.uniform(0.35, 1.9))
        off = float(rng.uniform(-45, 45))
        t[r0:r0 + hh, c0:c0 + ww] = t[r0:r0 + hh, c0:c0 + ww] * gain + off
    return np.clip(t, 0, 255).astype(np.float32)


class KittiProxyScene:
    """Infinite street corridor: ground plane + left/right facades.

    World frame = first camera frame (CV axes: x right, y down, z forward).
    The camera sits `cam_height` above the ground (ground at y = cam_height)
    and the facades at x = -road_half and x = +road_half.
    """

    def __init__(self, rng: np.random.Generator | None = None,
                 image_shape: tuple[int, int] = (376, 1241),
                 K: np.ndarray | None = None,
                 cam_height: float = 1.65,
                 road_half: float = 8.0,
                 tex_size: int = 2048,
                 tex_meters: float = 64.0):
        rng = rng or np.random.default_rng(0)
        h, w = image_shape
        if K is None:
            # KITTI odometry cam0-ish intrinsics
            f = 718.856 * (w / 1241.0)
            K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]],
                         np.float32)
        self.K = K.astype(np.float32)
        self.image_shape = image_shape
        self.cam_height = cam_height
        self.road_half = road_half
        self.tex_size = tex_size
        self.tex_meters = tex_meters   # texture tile edge in meters
        self.tex_ground = _street_texture(rng, tex_size, contrast=110.0,
                                          base=95.0)
        self.tex_left = _street_texture(rng, tex_size)
        self.tex_right = _street_texture(rng, tex_size)
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        pix = np.stack([xs, ys, np.ones_like(xs)], axis=-1)
        self.rays_cam = pix @ np.linalg.inv(self.K).T      # [h, w, 3]

    # ------------------------------------------------------------------
    def _planes(self):
        """(normal-axis, plane-offset, texture, uv-axes) per surface."""
        return (
            (1, self.cam_height, self.tex_ground, (0, 2)),   # ground y=+h
            (0, -self.road_half, self.tex_left, (2, 1)),     # left  x=-r
            (0, +self.road_half, self.tex_right, (2, 1)),    # right x=+r
        )

    def _sample(self, tex: np.ndarray, a: np.ndarray, b: np.ndarray):
        ts = self.tex_size
        u = (a / self.tex_meters) * ts
        v = (b / self.tex_meters) * ts
        u0 = np.floor(u).astype(np.int64)
        v0 = np.floor(v).astype(np.int64)
        fu = (u - u0).astype(np.float32)
        fv = (v - v0).astype(np.float32)
        u0 %= ts
        v0 %= ts
        u1 = (u0 + 1) % ts
        v1 = (v0 + 1) % ts
        return (tex[v0, u0] * (1 - fv) * (1 - fu) + tex[v0, u1] * (1 - fv) * fu
                + tex[v1, u0] * fv * (1 - fu) + tex[v1, u1] * fv * fu)

    def render(self, T_wc: np.ndarray) -> np.ndarray:
        R = T_wc[:3, :3].astype(np.float32)
        t = T_wc[:3, 3].astype(np.float32)
        dirs = self.rays_cam @ R.T
        h, w = self.image_shape
        best_lam = np.full((h, w), np.inf, np.float32)
        out = np.full((h, w), 30.0, np.float32)   # sky fallback
        for axis, off, tex, (ua, va) in self._planes():
            d = dirs[..., axis]
            lam = (off - t[axis]) / np.where(np.abs(d) < 1e-6, 1e-6, d)
            hit = (lam > 0.5) & (lam < best_lam)
            p = t[None, None, :] + lam[..., None] * dirs
            # facades only above ground, ground only between facades
            if axis == 0:
                hit &= (p[..., 1] < self.cam_height + 1e-3)
            else:
                hit &= (np.abs(p[..., 0]) <= self.road_half + 1e-3)
            val = self._sample(tex, p[..., ua], p[..., va])
            out = np.where(hit, val, out)
            best_lam = np.where(hit, lam, best_lam)
        return out

    def raycast(self, T_wc: np.ndarray, uv: np.ndarray):
        """Exact 3D world hit per pixel ray. uv [N, 2] -> (xyz [N,3], ok)."""
        R = T_wc[:3, :3].astype(np.float64)
        t = T_wc[:3, 3].astype(np.float64)
        pix = np.concatenate([uv, np.ones_like(uv[:, :1])], -1)
        dirs = (pix @ np.linalg.inv(self.K.astype(np.float64)).T) @ R.T
        n = len(uv)
        best_lam = np.full(n, np.inf)
        xyz = np.zeros((n, 3))
        ok = np.zeros(n, bool)
        for axis, off, _, _ in self._planes():
            d = dirs[:, axis]
            lam = (off - t[axis]) / np.where(np.abs(d) < 1e-6, 1e-6, d)
            p = t[None, :] + lam[:, None] * dirs
            hit = (lam > 0.5) & (lam < best_lam)
            if axis == 0:
                hit &= p[:, 1] < self.cam_height + 1e-3
            else:
                hit &= np.abs(p[:, 0]) <= self.road_half + 1e-3
            xyz[hit] = p[hit]
            best_lam = np.where(hit, lam, best_lam)
            ok |= hit
        return xyz, ok

    def camera_path(self, n_frames: int, speed: float = 0.8,
                    curve: float = 0.15, curve_freq: float = 0.02,
                    sway: float = 0.05):
        """Forward-dominant street driving path (T_wc per frame).

        speed is meters/frame (KITTI ~0.8-1.2 m/frame at 10 Hz). The
        heading WEAVES sinusoidally (amplitude `curve` rad, frequency
        `curve_freq` rad/frame) so the lateral excursion stays bounded
        (~speed*curve/curve_freq) and arbitrarily long sequences never
        leave the corridor; `sway` adds small lateral oscillation on top."""
        poses = []
        pos = np.zeros(3, np.float64)
        for i in range(n_frames):
            yaw = curve * np.sin(curve_freq * i)
            c, s = np.cos(yaw), np.sin(yaw)
            Rw = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)
            step = Rw @ np.array([0.0, 0.0, speed])
            lateral = Rw @ np.array([sway * np.sin(0.05 * i), 0.0, 0.0])
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = Rw.astype(np.float32)
            T[:3, 3] = (pos + lateral).astype(np.float32)
            poses.append(T)
            pos = pos + step
        return poses

    def loop_path(self, n_frames: int, speed: float = 0.5,
                  sway: float = 0.04):
        """Out-and-back drive for the loop-closure benchmark: forward for
        n/2 frames, then reverse along the same track with UNCHANGED
        heading (dolly backward), so every return-leg frame revisits an
        outbound view from the same position and direction — the regime
        place recognition can match. Odometry drift accumulates over the
        full outbound leg; closures become possible once the revisited
        keyframes age past the ring (db path) or min_gap (ring path)."""
        half = n_frames // 2
        poses = []
        pos = np.zeros(3, np.float64)
        for i in range(n_frames):
            direction = 1.0 if i < half else -1.0
            lateral = np.array([sway * np.sin(0.05 * i), 0.0, 0.0])
            T = np.eye(4, dtype=np.float32)
            T[:3, 3] = (pos + lateral).astype(np.float32)
            poses.append(T)
            pos = pos + direction * np.array([0.0, 0.0, speed])
        return poses

    def render_sequence(self, poses):
        return [self.render(T) for T in poses]
