"""Pyramidal LK vs cv2.calcOpticalFlowPyrLK oracle (SURVEY.md section 4:
LK flow on synthetic translations)."""

import cv2
import jax.numpy as jnp
import numpy as np

from ros2_mono_vo_tpu.ops.lk import build_lk_pyramid, lk_track
from tests.test_features import make_texture


def track_cv(img1, img2, pts):
    nxt, status, err = cv2.calcOpticalFlowPyrLK(
        img1.astype(np.uint8), img2.astype(np.uint8),
        pts.astype(np.float32).reshape(-1, 1, 2), None)
    return nxt.reshape(-1, 2), status.ravel().astype(bool), err.ravel()


def corners_of(img, n=64):
    pts = cv2.goodFeaturesToTrack(img.astype(np.uint8), n, 0.01, 10)
    return pts.reshape(-1, 2)


class TestLK:
    def test_pure_translation(self, rng):
        img1 = make_texture(rng, 240, 320)
        dx, dy = 5.3, -3.7
        M = np.float32([[1, 0, dx], [0, 1, dy]])
        img2 = cv2.warpAffine(img1, M, (320, 240))
        pts = corners_of(img1)
        inner = ((pts[:, 0] > 30) & (pts[:, 0] < 290)
                 & (pts[:, 1] > 30) & (pts[:, 1] < 210))
        pts = pts[inner]
        p1 = build_lk_pyramid(jnp.asarray(img1), 4)
        p2 = build_lk_pyramid(jnp.asarray(img2), 4)
        res = lk_track(p1, p2, jnp.asarray(pts), jnp.ones(len(pts), bool))
        st = np.asarray(res.status)
        flow = np.asarray(res.uv) - pts
        assert st.mean() > 0.8
        good = np.abs(flow[st] - [dx, dy]) < 0.5
        assert good.all(axis=1).mean() > 0.9

    def test_large_motion_needs_pyramid(self, rng):
        img1 = make_texture(rng, 240, 320)
        dx = 25.0
        M = np.float32([[1, 0, dx], [0, 1, 0]])
        img2 = cv2.warpAffine(img1, M, (320, 240))
        pts = corners_of(img1)
        inner = (pts[:, 0] > 40) & (pts[:, 0] < 250) & (pts[:, 1] > 40) & (pts[:, 1] < 200)
        pts = pts[inner]
        p1 = build_lk_pyramid(jnp.asarray(img1), 4)
        p2 = build_lk_pyramid(jnp.asarray(img2), 4)
        res = lk_track(p1, p2, jnp.asarray(pts), jnp.ones(len(pts), bool))
        st = np.asarray(res.status)
        flow = np.asarray(res.uv) - pts
        assert (np.abs(flow[st][:, 0] - dx) < 1.0).mean() > 0.8

    def test_agrees_with_cv2(self, rng):
        """Rotation+translation warp: our tracked points should agree with
        OpenCV's for the points both mark as good."""
        img1 = make_texture(rng, 240, 320)
        M = cv2.getRotationMatrix2D((160, 120), 3.0, 1.0)
        M[:, 2] += [4.0, -2.0]
        img2 = cv2.warpAffine(img1, M, (320, 240))
        pts = corners_of(img1)
        inner = (pts[:, 0] > 30) & (pts[:, 0] < 290) & (pts[:, 1] > 30) & (pts[:, 1] < 210)
        pts = pts[inner]
        p1 = build_lk_pyramid(jnp.asarray(img1), 4)
        p2 = build_lk_pyramid(jnp.asarray(img2), 4)
        ours = lk_track(p1, p2, jnp.asarray(pts), jnp.ones(len(pts), bool))
        cv_uv, cv_st, _ = track_cv(img1, img2, pts)
        both = np.asarray(ours.status) & cv_st
        assert both.sum() > 10
        d = np.linalg.norm(np.asarray(ours.uv)[both] - cv_uv[both], axis=-1)
        assert np.median(d) < 0.5
        assert (d < 1.5).mean() > 0.85

    def test_error_flags_occluded_points(self, rng):
        """Blank out a region in img2: points there should report high error
        (the reference drops err >= 30, tracker.cpp:70-77)."""
        img1 = make_texture(rng, 240, 320)
        img2 = img1.copy()
        img2[60:140, 60:140] = 0.0
        pts = corners_of(img1)
        inner = (pts[:, 0] > 25) & (pts[:, 0] < 295) & (pts[:, 1] > 25) & (pts[:, 1] < 215)
        pts = pts[inner]
        in_hole = ((pts[:, 0] > 75) & (pts[:, 0] < 125)
                   & (pts[:, 1] > 75) & (pts[:, 1] < 125))
        if in_hole.sum() == 0:
            return
        p1 = build_lk_pyramid(jnp.asarray(img1), 4)
        p2 = build_lk_pyramid(jnp.asarray(img2), 4)
        res = lk_track(p1, p2, jnp.asarray(pts), jnp.ones(len(pts), bool))
        err = np.asarray(res.err)
        assert np.median(err[in_hole]) > 30.0
        assert np.median(err[~in_hole]) < 10.0

    def test_invalid_slots_stay_invalid(self, rng):
        img1 = make_texture(rng, 120, 160)
        p1 = build_lk_pyramid(jnp.asarray(img1), 3)
        pts = np.tile([[80.0, 60.0]], (8, 1)).astype(np.float32)
        valid = np.arange(8) < 4
        res = lk_track(p1, p1, jnp.asarray(pts), jnp.asarray(valid), levels=3)
        st = np.asarray(res.status)
        assert st[:4].all() and not st[4:].any()
