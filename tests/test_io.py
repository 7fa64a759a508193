"""IO layer: native PNG loader vs cv2 oracle, dataset readers, checkpointing."""

import os

import cv2
import numpy as np
import pytest

from ros2_mono_vo_tpu.io.native_loader import (
    native_available, decode_png, PrefetchingLoader)


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory, ):
    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("pngs")
    paths = []
    # grayscale
    g = rng.integers(0, 256, (120, 160), np.uint8)
    p = str(d / "gray.png")
    cv2.imwrite(p, g)
    paths.append((p, g.astype(np.float32)))
    # color (BGR on disk via cv2) — loader must match cv2 grayscale conversion
    c = rng.integers(0, 256, (90, 130, 3), np.uint8)
    p = str(d / "color.png")
    cv2.imwrite(p, c)
    paths.append((p, cv2.imread(p, cv2.IMREAD_GRAYSCALE).astype(np.float32)))
    # 16-bit grayscale
    g16 = rng.integers(0, 65536, (64, 80), np.uint16)
    p = str(d / "gray16.png")
    cv2.imwrite(p, g16)
    paths.append((p, (g16 / 257.0).astype(np.float32)))
    return paths


class TestNativeDecode:
    def test_builds(self):
        assert native_available(), "g++ build of frame_loader failed"

    def test_gray_exact(self, png_dir):
        path, ref = png_dir[0]
        out = decode_png(path)
        assert out is not None
        np.testing.assert_array_equal(out, ref)

    def test_color_matches_cv2(self, png_dir):
        path, ref = png_dir[1]
        out = decode_png(path)
        assert out is not None
        assert out.shape == ref.shape
        # BT.601 weights; cv2 uses fixed-point coefficients and rounds, we
        # keep exact float — allow ~1.5 intensity steps
        assert np.abs(out - ref).max() <= 1.5

    def test_16bit(self, png_dir):
        path, ref = png_dir[2]
        out = decode_png(path)
        assert out is not None
        assert np.abs(out - ref).max() <= 2.0

    def test_missing_file(self):
        assert decode_png("/nonexistent/file.png") is None

    def test_prefetching_loader_order_and_content(self, png_dir, tmp_path):
        rng = np.random.default_rng(1)
        paths = []
        refs = []
        for i in range(20):
            img = rng.integers(0, 256, (60, 70), np.uint8)
            p = str(tmp_path / f"f{i:03d}.png")
            cv2.imwrite(p, img)
            paths.append(p)
            refs.append(img.astype(np.float32))
        loader = PrefetchingLoader(paths, ring=4, threads=3)
        got = list(loader)
        loader.close()
        assert len(got) == 20
        for g, r in zip(got, refs):
            np.testing.assert_array_equal(g, r)


class TestDatasets:
    def test_kitti_layout(self, tmp_path, rng):
        root = tmp_path / "kitti"
        seq = root / "sequences" / "00"
        (seq / "image_0").mkdir(parents=True)
        (root / "poses").mkdir()
        for i in range(4):
            img = rng.integers(0, 256, (37, 61), np.uint8)
            cv2.imwrite(str(seq / "image_0" / f"{i:06d}.png"), img)
        (seq / "calib.txt").write_text(
            "P0: 700.0 0.0 30.0 0.0 0.0 700.0 18.0 0.0 0.0 0.0 1.0 0.0\n")
        (seq / "times.txt").write_text("".join(f"{0.1*i}\n" for i in range(4)))
        (root / "poses" / "00.txt").write_text(
            "".join("1 0 0 {} 0 1 0 0 0 0 1 0\n".format(0.5 * i)
                    for i in range(4)))

        from ros2_mono_vo_tpu.io.datasets import KittiOdometry
        ds = KittiOdometry(str(root), "00")
        assert len(ds) == 4
        info = ds.camera_info()
        assert info.K[0, 0] == pytest.approx(700.0)
        frames = list(ds)
        assert frames[0][1].shape == (37, 61)
        gt = ds.ground_truth()
        assert len(gt) == 4
        assert gt[2][1][0, 3] == pytest.approx(1.0)

    def test_tum_layout(self, tmp_path, rng):
        root = tmp_path / "rgbd_dataset_freiburg1_xyz"
        (root / "rgb").mkdir(parents=True)
        lines = ["# comment\n"]
        for i in range(3):
            img = rng.integers(0, 256, (24, 32), np.uint8)
            cv2.imwrite(str(root / "rgb" / f"{i}.png"), img)
            lines.append(f"{1000.0 + 0.03 * i} rgb/{i}.png\n")
        (root / "rgb.txt").write_text("".join(lines))
        (root / "groundtruth.txt").write_text(
            "# gt\n1000.0 0 0 0 0 0 0 1\n1000.06 0.1 0 0 0 0 0 1\n")

        from ros2_mono_vo_tpu.io.datasets import TumRgbd
        ds = TumRgbd(str(root))
        assert len(ds) == 3
        assert ds.camera_info().K[0, 0] == pytest.approx(517.3)
        gt = ds.ground_truth()
        assert gt[1][1][0, 3] == pytest.approx(0.1)


class TestCheckpoint:
    def test_roundtrip_and_resume(self, tmp_path):
        import jax
        from ros2_mono_vo_tpu.config import VOConfig, FrontendConfig, TrackerConfig
        from ros2_mono_vo_tpu.io.synthetic import SyntheticScene
        from ros2_mono_vo_tpu.pipeline.device_vo import DeviceMonoVO
        from ros2_mono_vo_tpu.utils.checkpoint import (save_checkpoint,
                                                       load_checkpoint)
        scene = SyntheticScene(np.random.default_rng(3), image_shape=(240, 320))
        poses = scene.camera_path(24)
        frames = np.stack(scene.render_sequence(poses))
        cfg = VOConfig(frontend=FrontendConfig(
            max_features=512, num_pyramid_levels=4, ransac_hypotheses=256,
            max_landmarks=4096, max_keyframes=16),
            tracker=TrackerConfig(min_observations_before_triangulation=60))
        vo = DeviceMonoVO(cfg, scene.K, scene.image_shape, seed=1, chunk=12)
        vo.process_chunk(frames[:12])
        save_checkpoint(str(tmp_path / "ckpt"), vo.carry, cfg,
                        scene.image_shape, extra={"frame_idx": 12})

        # continue original
        outs_a = vo.process_chunk(frames[12:])

        # resume from checkpoint in a fresh engine
        vo2 = DeviceMonoVO(cfg, scene.K, scene.image_shape, seed=1, chunk=12)
        carry, extra = load_checkpoint(str(tmp_path / "ckpt"), cfg,
                                       scene.image_shape)
        vo2.carry = carry
        vo2._tracking = bool(np.asarray(carry.mode) >= 2)
        assert extra["frame_idx"] == 12
        outs_b = vo2.process_chunk(frames[12:])
        np.testing.assert_allclose(np.asarray(outs_a.pose_wc),
                                   np.asarray(outs_b.pose_wc), atol=1e-5)

    def test_config_mismatch_rejected(self, tmp_path):
        from ros2_mono_vo_tpu.config import VOConfig, FrontendConfig
        from ros2_mono_vo_tpu.pipeline.device_vo import init_carry
        from ros2_mono_vo_tpu.utils.checkpoint import (save_checkpoint,
                                                       load_checkpoint)
        cfg1 = VOConfig(frontend=FrontendConfig(max_features=256,
                                                num_pyramid_levels=4))
        cfg2 = VOConfig(frontend=FrontendConfig(max_features=512,
                                                num_pyramid_levels=4))
        carry = init_carry(cfg1, (64, 64))
        save_checkpoint(str(tmp_path / "c"), carry, cfg1, (64, 64))
        with pytest.raises(ValueError, match="mismatch"):
            load_checkpoint(str(tmp_path / "c"), cfg2, (64, 64))
