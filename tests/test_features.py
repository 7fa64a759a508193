"""Feature front-end vs OpenCV oracles (SURVEY.md section 4)."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ros2_mono_vo_tpu.config import FrontendConfig, level_feature_budget
from ros2_mono_vo_tpu.ops.features import (
    detect_and_describe, fast_corner_score, harris_response, build_pyramid,
    occupancy_grid_check, pack_descriptors, steered_brief,
    orientation_from_patches, _extract_patches, _box_blur5,
)
from ros2_mono_vo_tpu.ops.matching import match_descriptors, hamming_distance_matrix


def make_texture(rng, h=240, w=320, n_rects=60):
    """Synthetic textured image with strong corners (random rectangles:
    L-junctions fire FAST-9, unlike checkerboard X-junctions)."""
    img = np.full((h, w), 50.0, np.float32)
    for _ in range(n_rects):
        r0 = int(rng.integers(0, h - 20))
        c0 = int(rng.integers(0, w - 20))
        rh = int(rng.integers(8, 40))
        rw = int(rng.integers(8, 40))
        img[r0:r0 + rh, c0:c0 + rw] = float(rng.uniform(80, 250))
    img += rng.normal(0, 2, size=(h, w)).astype(np.float32)
    return np.clip(img, 0, 255)


SMALL_CFG = FrontendConfig(max_features=256, num_pyramid_levels=4)


class TestFast:
    def test_fast_agrees_with_cv2_on_corners(self, rng):
        img = make_texture(rng)
        score = np.asarray(fast_corner_score(jnp.asarray(img), 20.0))
        fast = cv2.FastFeatureDetector_create(threshold=20, nonmaxSuppression=False)
        kps = fast.detect(img.astype(np.uint8), None)
        cv_mask = np.zeros(img.shape, bool)
        for kp in kps:
            cv_mask[int(round(kp.pt[1])), int(round(kp.pt[0]))] = True
        ours = score > 0
        inner = np.zeros_like(ours)
        inner[8:-8, 8:-8] = True
        both = (ours & cv_mask & inner).sum()
        cv_total = (cv_mask & inner).sum()
        # uint8 rounding vs float input causes threshold-boundary flips;
        # require high overlap, not equality
        assert cv_total > 50
        assert both / cv_total > 0.85

    def test_flat_image_has_no_corners(self):
        img = jnp.full((64, 64), 100.0)
        assert np.asarray(fast_corner_score(img, 20.0)).max() == 0.0


class TestHarris:
    def test_harris_peaks_near_cv2_corners(self, rng):
        img = make_texture(rng)
        h = np.array(harris_response(jnp.asarray(img)))
        h[:8] = h[-8:] = 0
        h[:, :8] = h[:, -8:] = 0
        r, c = np.unravel_index(np.argmax(h), h.shape)
        corners = cv2.goodFeaturesToTrack(
            img.astype(np.uint8), 50, 0.01, 5, useHarrisDetector=True)
        d = np.linalg.norm(corners[:, 0, :] - np.array([c, r]), axis=-1).min()
        assert d < 4.0


class TestDetect:
    def test_budget_and_masks(self, rng):
        img = make_texture(rng)
        feats = detect_and_describe(jnp.asarray(img), SMALL_CFG)
        assert feats.uv.shape == (256, 2)
        assert feats.desc.shape == (256, 256)
        assert int(feats.valid.sum()) > 100
        uv = np.asarray(feats.uv)[np.asarray(feats.valid)]
        assert (uv[:, 0] >= 0).all() and (uv[:, 0] < 320 * 1.01).all()

    def test_level_budget_sums(self):
        cfg = FrontendConfig(max_features=1024, num_pyramid_levels=8)
        assert sum(level_feature_budget(cfg)) == 1024

    def test_detections_near_cv2_corners(self, rng):
        img = make_texture(rng)
        feats = detect_and_describe(jnp.asarray(img), SMALL_CFG)
        valid = np.asarray(feats.valid)
        uv = np.asarray(feats.uv)[valid]
        lvl0 = uv[np.asarray(feats.level)[valid] == 0]
        fast = cv2.FastFeatureDetector_create(threshold=20, nonmaxSuppression=True)
        kps = fast.detect(img.astype(np.uint8), None)
        cv_pts = np.array([kp.pt for kp in kps], np.float32)
        assert len(lvl0) > 20 and len(cv_pts) > 20
        d = np.linalg.norm(lvl0[:, None, :] - cv_pts[None, :, :], axis=-1).min(axis=1)
        assert (d < 3).mean() > 0.8

    def test_descriptor_rotation_invariance(self, rng):
        """Descriptors of the same patch under in-plane rotation should be
        much closer than random descriptors (steering works)."""
        img = make_texture(rng, 200, 200)
        center = np.array([[100, 100]], np.int32)
        patch = _extract_patches(jnp.asarray(_box_blur5(jnp.asarray(img))),
                                 jnp.asarray(center), 15)
        ang = orientation_from_patches(patch)
        d0 = steered_brief(patch, ang)

        M = cv2.getRotationMatrix2D((100, 100), 30.0, 1.0)
        rimg = cv2.warpAffine(img, M, (200, 200))
        rpatch = _extract_patches(jnp.asarray(_box_blur5(jnp.asarray(rimg))),
                                  jnp.asarray(center), 15)
        rang = orientation_from_patches(rpatch)
        d1 = steered_brief(rpatch, rang)
        ham_rot = float((256 - jnp.sum(d0 * d1)) / 2)
        assert ham_rot < 80  # random pairs average 128


class TestOccupancyGrid:
    def test_uniform_vs_clustered(self, rng):
        h, w = 200, 300
        n = 128
        uv_uniform = np.stack([rng.uniform(0, w, n), rng.uniform(0, h, n)], -1)
        uv_cluster = np.stack([rng.uniform(0, 40, n), rng.uniform(0, 40, n)], -1)
        valid = np.ones(n, bool)
        ok_u, occ_u = occupancy_grid_check(
            jnp.asarray(uv_uniform, jnp.float32), jnp.asarray(valid), (h, w), 50, 0.5)
        ok_c, occ_c = occupancy_grid_check(
            jnp.asarray(uv_cluster, jnp.float32), jnp.asarray(valid), (h, w), 50, 0.5)
        assert bool(ok_u) and not bool(ok_c)
        assert float(occ_u) > float(occ_c)

    def test_invalid_points_dont_count(self):
        uv = jnp.asarray(np.tile([[10.0, 10.0]], (64, 1)), jnp.float32)
        ok, occ = occupancy_grid_check(uv, jnp.zeros(64, bool), (200, 300), 50, 0.01)
        assert float(occ) == 0.0


class TestMatching:
    def test_vs_cv2_bfmatcher(self, rng):
        n, m, bits = 200, 180, 256
        a = np.where(rng.random((n, bits)) > 0.5, 1.0, -1.0).astype(np.float32)
        # make b a noisy copy of a subset of a so there are real matches
        b = a[:m].copy()
        flip = rng.random((m, bits)) < 0.05
        b[flip] *= -1
        res = match_descriptors(jnp.asarray(a), jnp.ones(n, bool),
                                jnp.asarray(b), jnp.ones(m, bool), 0.7)
        pa, pb = pack_descriptors(a), pack_descriptors(b)
        bf = cv2.BFMatcher(cv2.NORM_HAMMING)
        knn = bf.knnMatch(pa, pb, k=2)
        cv_matches = {}
        for pair in knn:
            if len(pair) == 2 and pair[0].distance < 0.7 * pair[1].distance:
                cv_matches[pair[0].queryIdx] = pair[0].trainIdx
        ours_valid = np.asarray(res.valid)
        ours_idx = np.asarray(res.idx)
        # same accepted set and same pairing
        assert set(np.nonzero(ours_valid)[0]) == set(cv_matches.keys())
        for q, t in cv_matches.items():
            assert ours_idx[q] == t

    def test_distance_matrix_fast_matches_exact(self, rng):
        a = np.where(rng.random((64, 256)) > 0.5, 1.0, -1.0).astype(np.float32)
        b = np.where(rng.random((48, 256)) > 0.5, 1.0, -1.0).astype(np.float32)
        fast = np.asarray(hamming_distance_matrix(jnp.asarray(a), jnp.asarray(b), fast=True))
        exact = (256 - a @ b.T) / 2
        np.testing.assert_array_equal(fast, exact)

    def test_invalid_train_never_matched(self, rng):
        a = np.where(rng.random((16, 256)) > 0.5, 1.0, -1.0).astype(np.float32)
        b = np.concatenate([a[:8], a[:8]])  # duplicates
        valid_b = np.arange(16) < 8
        res = match_descriptors(jnp.asarray(a[:8]), jnp.ones(8, bool),
                                jnp.asarray(b), jnp.asarray(valid_b), 0.99)
        assert (np.asarray(res.idx)[np.asarray(res.valid)] < 8).all()


class TestEndToEndMatching:
    def test_translated_image_matches_consistent(self, rng):
        """Detect on an image and a shifted copy; matched pairs should differ
        by the shift."""
        img = make_texture(rng, 240, 320)
        shift = 8
        img2 = np.roll(img, shift, axis=1)
        f1 = detect_and_describe(jnp.asarray(img), SMALL_CFG)
        f2 = detect_and_describe(jnp.asarray(img2), SMALL_CFG)
        res = match_descriptors(f1.desc, f1.valid, f2.desc, f2.valid, 0.7)
        v = np.asarray(res.valid)
        assert v.sum() > 30
        duv = np.asarray(f2.uv)[np.asarray(res.idx)[v]] - np.asarray(f1.uv)[v]
        good = (np.abs(duv[:, 0] - shift) < 2) & (np.abs(duv[:, 1]) < 2)
        assert good.mean() > 0.7
