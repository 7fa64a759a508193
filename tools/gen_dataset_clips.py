"""Generate TUM-layout and EuRoC-layout mini clips under tests/data/.

Mirrors tests/data/kitti_mini (VERDICT round-4 #8): 12 proxy-rendered
frames written in each dataset's REAL on-disk format, so the TumRgbd /
EurocMav readers and the `run.py --dataset tum|euroc` paths get the same
end-to-end clip coverage the KITTI path has.

- TUM: rendered with the Freiburg1 factory intrinsics the reader defaults
  to; rgb/ PNGs + rgb.txt + groundtruth.txt (stamp tx ty tz qx qy qz qw).
- EuRoC: rendered with cam0 intrinsics, then DISTORTED with the cam0
  radial-tangential model (cv2.undistortPoints-built remap) so the
  reader's default rectification path is exercised for real; mav0/cam0/
  data/*.png + data.csv + state_groundtruth_estimate0/data.csv (qw first).

Usage: python tools/gen_dataset_clips.py
"""
from __future__ import annotations

import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_FRAMES = 12
DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "data")


def _quat_from_R(R: np.ndarray) -> tuple[float, float, float, float]:
    """Rotation matrix -> (qx, qy, qz, qw)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 1e-12)) * 2
        q = [0.0, 0.0, 0.0]
        q[i] = 0.25 * s
        q[j] = (R[j, i] + R[i, j]) / s
        q[k] = (R[k, i] + R[i, k]) / s
        w = (R[k, j] - R[j, k]) / s
        x, y, z = q
    return float(x), float(y), float(z), float(w)


def _render(K, image_shape, speed):
    from ros2_mono_vo_tpu.io.kitti_proxy import KittiProxyScene
    rng = np.random.default_rng(42)
    scene = KittiProxyScene(rng, image_shape=image_shape,
                            K=K.astype(np.float32))
    poses = scene.camera_path(N_FRAMES, speed=speed, curve=0.06, sway=0.02)
    frames = [np.clip(scene.render(T), 0, 255).astype(np.uint8)
              for T in poses]
    return poses, frames


def gen_tum():
    import cv2
    from ros2_mono_vo_tpu.io.datasets import TumRgbd
    K = TumRgbd.FR1_K
    root = os.path.join(DATA, "tum_mini")
    rgb_dir = os.path.join(root, "rgb")
    os.makedirs(rgb_dir, exist_ok=True)
    poses, frames = _render(K, (480, 640), speed=0.45)
    with open(os.path.join(root, "rgb.txt"), "w") as f:
        f.write("# color images\n# file: 'mini'\n# timestamp filename\n")
        for i, img in enumerate(frames):
            stamp = 1305031102.0 + 0.1 * i
            name = f"rgb/{stamp:.6f}.png"
            cv2.imwrite(os.path.join(root, name), img)
            f.write(f"{stamp:.6f} {name}\n")
    with open(os.path.join(root, "groundtruth.txt"), "w") as f:
        f.write("# ground truth trajectory\n# timestamp tx ty tz qx qy qz qw\n")
        for i, T in enumerate(poses):
            stamp = 1305031102.0 + 0.1 * i
            qx, qy, qz, qw = _quat_from_R(T[:3, :3])
            t = T[:3, 3]
            f.write(f"{stamp:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                    f"{qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}\n")
    print("wrote", root)


def gen_euroc():
    import cv2
    from ros2_mono_vo_tpu.io.datasets import EurocMav
    K = EurocMav.K_CAM0.astype(np.float64)
    D = EurocMav.D_CAM0.astype(np.float64)
    h, w = 480, 752
    root = os.path.join(DATA, "euroc_mini")
    data_dir = os.path.join(root, "mav0", "cam0", "data")
    gt_dir = os.path.join(root, "mav0", "state_groundtruth_estimate0")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)
    poses, frames = _render(EurocMav.K_CAM0, (h, w), speed=0.4)

    # distortion remap: distorted[u_d] = ideal[undistort(u_d)]
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    pts = np.stack([xs.ravel(), ys.ravel()], -1).reshape(-1, 1, 2)
    und = cv2.undistortPoints(pts, K, D, P=K).reshape(h, w, 2)
    map_x = und[..., 0].astype(np.float32)
    map_y = und[..., 1].astype(np.float32)

    t0 = 1403636579763555584
    with open(os.path.join(root, "mav0", "cam0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],filename\n")
        for i, img in enumerate(frames):
            dist = cv2.remap(img, map_x, map_y, cv2.INTER_LINEAR,
                             borderMode=cv2.BORDER_REPLICATE)
            ns = t0 + i * 50_000_000
            name = f"{ns}.png"
            cv2.imwrite(os.path.join(data_dir, name), dist)
            f.write(f"{ns},{name}\n")
    with open(os.path.join(gt_dir, "data.csv"), "w") as f:
        f.write("#timestamp, p_RS_R_x [m], p_RS_R_y [m], p_RS_R_z [m], "
                "q_RS_w [], q_RS_x [], q_RS_y [], q_RS_z []\n")
        for i, T in enumerate(poses):
            ns = t0 + i * 50_000_000
            qx, qy, qz, qw = _quat_from_R(T[:3, :3])
            t = T[:3, 3]
            f.write(f"{ns},{t[0]:.6f},{t[1]:.6f},{t[2]:.6f},"
                    f"{qw:.6f},{qx:.6f},{qy:.6f},{qz:.6f}\n")
    print("wrote", root)


if __name__ == "__main__":
    gen_tum()
    gen_euroc()
