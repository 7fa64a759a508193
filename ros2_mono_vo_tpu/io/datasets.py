"""Dataset readers: KITTI odometry, TUM RGB-D (mono), EuRoC MAV (left cam).

Replaces the reference's ROS topic input (`/camera/image_rect` +
`/camera/camera_info`, mono_vo.cpp:43-55) with host-side sequence readers for
the benchmark datasets named in BASELINE.json. Images are returned as
float32 grayscale [H, W] in [0, 255] — exactly what the engine consumes.

All readers share the `Sequence` interface; `camera_info` latches intrinsics
once like the reference's camera_info_callback (mono_vo.cpp:200-208).
"""

from __future__ import annotations

import csv
import os
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np


@dataclass
class CameraInfo:
    K: np.ndarray                  # [3, 3]
    distortion: Optional[np.ndarray] = None  # [5] or None (rectified input)
    width: int = 0
    height: int = 0


class Sequence:
    """Iterable of (stamp, grayscale float32 image [H, W])."""

    def camera_info(self) -> CameraInfo:
        raise NotImplementedError

    def ground_truth(self) -> Optional[list[tuple[float, np.ndarray]]]:
        """(stamp, T_w_cam [4, 4]) if the dataset ships ground truth."""
        return None

    def __len__(self) -> int:
        raise NotImplementedError

    def __iter__(self) -> Iterator[tuple[float, np.ndarray]]:
        raise NotImplementedError


def _load_gray(path: str) -> np.ndarray:
    import cv2  # host-side decode only; never on the device compute path

    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    return img.astype(np.float32)


class KittiOdometry(Sequence):
    """KITTI odometry: <root>/sequences/<seq>/image_0/*.png + calib.txt;
    ground truth at <root>/poses/<seq>.txt."""

    def __init__(self, root: str, sequence: str = "00",
                 max_frames: int | None = None):
        self.seq_dir = os.path.join(root, "sequences", sequence)
        img_dir = os.path.join(self.seq_dir, "image_0")
        self.files = sorted(
            os.path.join(img_dir, f) for f in os.listdir(img_dir)
            if f.endswith(".png"))
        if max_frames:
            self.files = self.files[:max_frames]
        times_path = os.path.join(self.seq_dir, "times.txt")
        if os.path.exists(times_path):
            with open(times_path) as f:
                self.stamps = [float(line) for line in f][:len(self.files)]
        else:
            self.stamps = [0.1 * i for i in range(len(self.files))]
        self.gt_path = os.path.join(root, "poses", f"{sequence}.txt")
        self._info = self._read_calib()

    def _read_calib(self) -> CameraInfo:
        calib = os.path.join(self.seq_dir, "calib.txt")
        with open(calib) as f:
            for line in f:
                if line.startswith("P0:"):
                    vals = np.array([float(v) for v in line.split()[1:]])
                    P = vals.reshape(3, 4)
                    return CameraInfo(K=P[:, :3].astype(np.float32))
        raise ValueError(f"no P0 in {calib}")

    def camera_info(self) -> CameraInfo:
        return self._info

    def ground_truth(self):
        if not os.path.exists(self.gt_path):
            return None
        out = []
        with open(self.gt_path) as f:
            for i, line in enumerate(f):
                if i >= len(self.files):
                    break
                vals = np.array([float(v) for v in line.split()], np.float32)
                T = np.eye(4, dtype=np.float32)
                T[:3, :4] = vals.reshape(3, 4)
                out.append((self.stamps[i], T))
        return out

    def __len__(self):
        return len(self.files)

    def __iter__(self):
        for stamp, path in zip(self.stamps, self.files):
            yield stamp, _load_gray(path)


class TumRgbd(Sequence):
    """TUM RGB-D (mono): <root>/rgb.txt listing, groundtruth.txt.

    Default intrinsics are the Freiburg1/2 factory calibrations.
    """

    FR1_K = np.array([[517.3, 0, 318.6], [0, 516.5, 255.3], [0, 0, 1]],
                     np.float32)
    FR2_K = np.array([[520.9, 0, 325.1], [0, 521.0, 249.7], [0, 0, 1]],
                     np.float32)

    def __init__(self, root: str, max_frames: int | None = None,
                 K: np.ndarray | None = None):
        self.root = root
        with open(os.path.join(root, "rgb.txt")) as f:
            rows = [line.split() for line in f
                    if line.strip() and not line.startswith("#")]
        self.entries = [(float(s), os.path.join(root, p)) for s, p in rows]
        if max_frames:
            self.entries = self.entries[:max_frames]
        if K is None:
            K = self.FR1_K if "freiburg1" in root else (
                self.FR2_K if "freiburg2" in root else self.FR1_K)
        self._info = CameraInfo(K=K)

    def camera_info(self):
        return self._info

    def ground_truth(self):
        path = os.path.join(self.root, "groundtruth.txt")
        if not os.path.exists(path):
            return None
        out = []
        with open(path) as f:
            for line in f:
                if line.startswith("#") or not line.strip():
                    continue
                v = [float(x) for x in line.split()]
                stamp, t, q = v[0], v[1:4], v[4:8]  # qx qy qz qw
                T = np.eye(4, dtype=np.float32)
                x, y, z, w = q
                T[:3, :3] = np.array([
                    [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                    [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                    [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)]])
                T[:3, 3] = t
                out.append((stamp, T))
        return out

    def __len__(self):
        return len(self.entries)

    def __iter__(self):
        for stamp, path in self.entries:
            yield stamp, _load_gray(path)


class EurocMav(Sequence):
    """EuRoC MAV: <root>/mav0/cam0/data/*.png + data.csv; GT from
    state_groundtruth_estimate0. Left cam (cam0), mono."""

    # cam0 factory intrinsics (pinhole, pre-rectification)
    K_CAM0 = np.array([[458.654, 0, 367.215], [0, 457.296, 248.375],
                       [0, 0, 1]], np.float32)
    D_CAM0 = np.array([-0.2834, 0.0739, 0.0002, 1.76e-05, 0.0], np.float32)

    def __init__(self, root: str, max_frames: int | None = None,
                 rectify: bool = True):
        cam_dir = os.path.join(root, "mav0", "cam0")
        self.data_dir = os.path.join(cam_dir, "data")
        with open(os.path.join(cam_dir, "data.csv")) as f:
            rows = [r for r in csv.reader(f) if r and not r[0].startswith("#")]
        self.entries = [(int(r[0]) * 1e-9, os.path.join(self.data_dir, r[1]))
                        for r in rows]
        if max_frames:
            self.entries = self.entries[:max_frames]
        self.root = root
        self.rectify = rectify
        self._rect_maps = None
        self._info = CameraInfo(K=self.K_CAM0,
                                distortion=None if rectify else self.D_CAM0)

    def camera_info(self):
        return self._info

    def _maybe_rectify(self, img: np.ndarray) -> np.ndarray:
        if not self.rectify:
            return img
        import cv2

        if self._rect_maps is None:
            h, w = img.shape
            self._rect_maps = cv2.initUndistortRectifyMap(
                self.K_CAM0.astype(np.float64), self.D_CAM0.astype(np.float64),
                None, self.K_CAM0.astype(np.float64), (w, h), cv2.CV_32FC1)
        return cv2.remap(img, *self._rect_maps, cv2.INTER_LINEAR)

    def ground_truth(self):
        path = os.path.join(self.root, "mav0",
                            "state_groundtruth_estimate0", "data.csv")
        if not os.path.exists(path):
            return None
        out = []
        with open(path) as f:
            for r in csv.reader(f):
                if not r or r[0].startswith("#"):
                    continue
                stamp = int(r[0]) * 1e-9
                t = np.array([float(v) for v in r[1:4]])
                w, x, y, z = [float(v) for v in r[4:8]]   # EuRoC: qw first
                T = np.eye(4, dtype=np.float32)
                T[:3, :3] = np.array([
                    [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                    [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                    [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)]])
                T[:3, 3] = t
                out.append((stamp, T))
        return out

    def __len__(self):
        return len(self.entries)

    def __iter__(self):
        for stamp, path in self.entries:
            yield stamp, self._maybe_rectify(_load_gray(path))


def open_sequence(kind: str, root: str, **kw) -> Sequence:
    kinds = {"kitti": KittiOdometry, "tum": TumRgbd, "euroc": EurocMav}
    return kinds[kind](root, **kw)
