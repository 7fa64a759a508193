"""Trajectory export/import (TUM + KITTI formats) and ATE evaluation.

The reference's only trajectory output is the /path topic; for benchmark
parity (BASELINE.md) trajectories are exported in the standard formats and
scored with Sim(3)-aligned ATE-RMSE (monocular scale is arbitrary —
SURVEY.md quirks — so alignment must solve for scale).
"""

from __future__ import annotations

import numpy as np


def _pose_to_quat(T: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion (x, y, z, w), Shepperd's method."""
    R = T[:3, :3]
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 1e-12)) * 2
        q = np.zeros(4)
        q[i] = 0.25 * s
        q[3] = (R[k, j] - R[j, k]) / s
        q[j] = (R[j, i] + R[i, j]) / s
        q[k] = (R[k, i] + R[i, k]) / s
        x, y, z, w = q
    return np.array([x, y, z, w])


def write_tum(path: str, trajectory: list[tuple[float, np.ndarray]]) -> None:
    """TUM format: stamp tx ty tz qx qy qz qw."""
    with open(path, "w") as f:
        for stamp, T in trajectory:
            t = T[:3, 3]
            q = _pose_to_quat(T)
            f.write(f"{stamp:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                    f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n")


def write_kitti(path: str, trajectory: list[tuple[float, np.ndarray]]) -> None:
    """KITTI format: 12 row-major entries of the 3x4 pose per line."""
    with open(path, "w") as f:
        for _, T in trajectory:
            f.write(" ".join(f"{v:.6e}" for v in T[:3, :4].reshape(-1)) + "\n")


def read_kitti(path: str) -> list[np.ndarray]:
    out = []
    with open(path) as f:
        for line in f:
            vals = np.array([float(v) for v in line.split()], np.float32)
            T = np.eye(4, dtype=np.float32)
            T[:3, :4] = vals.reshape(3, 4)
            out.append(T)
    return out


def umeyama_alignment(src: np.ndarray, dst: np.ndarray, with_scale: bool = True):
    """Least-squares similarity transform dst ~ s * R @ src + t.

    src, dst: [N, 3]. Returns (s, R, t).
    """
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs ** 2).sum() / len(src)
        s = float(np.trace(np.diag(D) @ S) / max(var_s, 1e-12))
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(est_positions: np.ndarray, gt_positions: np.ndarray,
             with_scale: bool = True) -> float:
    """Sim(3)-aligned absolute trajectory error (RMSE over positions)."""
    s, R, t = umeyama_alignment(est_positions, gt_positions, with_scale)
    aligned = (s * (R @ est_positions.T)).T + t
    err = np.linalg.norm(aligned - gt_positions, axis=-1)
    return float(np.sqrt((err ** 2).mean()))


def trajectory_positions(trajectory: list[tuple[float, np.ndarray]]) -> np.ndarray:
    return np.stack([T[:3, 3] for _, T in trajectory])
