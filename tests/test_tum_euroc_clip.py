"""Real TUM- and EuRoC-format clips end-to-end (VERDICT round-4 #8).

tests/data/tum_mini and tests/data/euroc_mini are 12-frame clips in each
dataset's REAL on-disk layout (proxy-rendered — see
tools/gen_dataset_clips.py), giving the TumRgbd / EurocMav readers and
`run.py --dataset tum|euroc` the same clip-level coverage the KITTI path
has in test_kitti_clip.py. The EuRoC clip is stored DISTORTED with the
cam0 radial-tangential model, so the reader's default rectification path
is exercised for real.
"""

import json
import os

import numpy as np
import pytest

_DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
_TUM = os.path.join(_DATA, "tum_mini")
_EUROC = os.path.join(_DATA, "euroc_mini")


def test_tum_reader_real_clip():
    from ros2_mono_vo_tpu.io.datasets import TumRgbd
    seq = TumRgbd(_TUM)
    assert len(seq) == 12
    info = seq.camera_info()
    np.testing.assert_allclose(info.K, TumRgbd.FR1_K)
    stamps, frames = zip(*list(seq))
    assert frames[0].shape == (480, 640)
    assert frames[0].dtype == np.float32
    assert 10 < frames[0].mean() < 245
    assert stamps[1] - stamps[0] == pytest.approx(0.1)
    gt = seq.ground_truth()
    assert gt is not None and len(gt) == 12
    z = [T[2, 3] for _, T in gt]
    assert all(b > a for a, b in zip(z, z[1:]))   # forward drive
    # quaternion convention: R orthonormal, det +1
    R = gt[5][1][:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(R) > 0.99


def test_euroc_reader_real_clip_rectifies():
    cv2 = pytest.importorskip("cv2")
    from ros2_mono_vo_tpu.io.datasets import EurocMav
    seq = EurocMav(_EUROC)                      # default: rectify
    assert len(seq) == 12
    info = seq.camera_info()
    np.testing.assert_allclose(info.K, EurocMav.K_CAM0)
    assert info.distortion is None              # rectified output
    stamps, frames = zip(*list(seq))
    assert frames[0].shape == (480, 752)
    assert stamps[1] - stamps[0] == pytest.approx(0.05)
    # rectification must INVERT the stored distortion: the rectified frame
    # should be closer to the raw center crop statistics than the distorted
    # one at the border (smoke-level: frames valid + finite)
    raw = EurocMav(_EUROC, rectify=False)
    assert raw.camera_info().distortion is not None
    _, f_raw = next(iter(raw))
    _, f_rect = next(iter(seq))
    assert not np.array_equal(f_raw, f_rect)    # rectification did something
    gt = seq.ground_truth()
    assert gt is not None and len(gt) == 12
    z = [T[2, 3] for _, T in gt]
    assert all(b > a for a, b in zip(z, z[1:]))


@pytest.mark.parametrize("kind,root", [("tum", _TUM), ("euroc", _EUROC)])
def test_run_cli_end_to_end(tmp_path, kind, root):
    """`run.py --dataset tum|euroc` over the real-format clips: reader ->
    engine -> TUM trajectory + finite ATE (mirrors the KITTI clip test)."""
    from ros2_mono_vo_tpu.run import main
    out = tmp_path / "traj.txt"
    metrics = tmp_path / "metrics.json"
    main(["--dataset", kind, "--root", root,
          "--out", str(out), "--metrics", str(metrics), "--chunk", "6"])
    assert out.exists() and metrics.exists()
    m = json.loads(metrics.read_text())
    assert m["n_poses"] >= 3, m
    assert np.isfinite(m["ate_rmse"]), m
    lines = out.read_text().strip().splitlines()
    assert len(lines) == m["n_poses"]
    vals = np.array([[float(v) for v in l.split()] for l in lines])
    assert vals.shape[1] == 8
    assert np.isfinite(vals).all()
