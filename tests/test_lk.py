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


class TestPredictiveInit:
    """init_flow + start_level: the production tracker seeds LK with a
    constant-velocity prior and skips the coarse capture levels
    (FrontendConfig.lk_predictive)."""

    def test_good_prior_matches_full_pyramid(self, rng):
        img1 = make_texture(rng, 240, 320)
        dx, dy = 14.2, 6.8
        M = np.float32([[1, 0, dx], [0, 1, dy]])
        img2 = cv2.warpAffine(img1, M, (320, 240))
        pts = corners_of(img1)
        inner = ((pts[:, 0] > 40) & (pts[:, 0] < 260)
                 & (pts[:, 1] > 40) & (pts[:, 1] < 190))
        pts = pts[inner]
        p1 = build_lk_pyramid(jnp.asarray(img1), 4)
        p2 = build_lk_pyramid(jnp.asarray(img2), 4)
        full = lk_track(p1, p2, jnp.asarray(pts), jnp.ones(len(pts), bool))
        # prior off by ~2 px from truth, as a velocity model would be
        prior = jnp.broadcast_to(jnp.asarray([dx - 1.5, dy + 1.2],
                                             jnp.float32), (len(pts), 2))
        pred = lk_track(p1, p2, jnp.asarray(pts), jnp.ones(len(pts), bool),
                        init_flow=prior, start_level=1)
        st_f, st_p = np.asarray(full.status), np.asarray(pred.status)
        assert st_p.mean() >= st_f.mean() - 0.05
        both = st_f & st_p
        d = np.linalg.norm(np.asarray(pred.uv)[both]
                           - np.asarray(full.uv)[both], axis=-1)
        assert np.median(d) < 0.1
        flow_err = np.abs(np.asarray(pred.uv)[st_p] - pts[st_p] - [dx, dy])
        assert (flow_err < 0.5).all(axis=1).mean() > 0.9

    def test_bad_prior_within_headroom_recovers(self, rng):
        """A prior off by ~12 px (far beyond any frame-rate velocity-model
        error) still converges; points beyond the capture radius must fail
        SAFE (status False), never return silently wrong flow."""
        img1 = make_texture(rng, 240, 320)
        dx, dy = 5.0, -2.0
        M = np.float32([[1, 0, dx], [0, 1, dy]])
        img2 = cv2.warpAffine(img1, M, (320, 240))
        pts = corners_of(img1)
        inner = ((pts[:, 0] > 40) & (pts[:, 0] < 260)
                 & (pts[:, 1] > 40) & (pts[:, 1] < 190))
        pts = pts[inner]
        p1 = build_lk_pyramid(jnp.asarray(img1), 4)
        p2 = build_lk_pyramid(jnp.asarray(img2), 4)
        prior = jnp.broadcast_to(jnp.asarray([dx + 12.0, dy], jnp.float32),
                                 (len(pts), 2))
        pred = lk_track(p1, p2, jnp.asarray(pts), jnp.ones(len(pts), bool),
                        init_flow=prior, start_level=1)
        st = np.asarray(pred.status)
        assert st.mean() > 0.7
        flow_err = np.abs(np.asarray(pred.uv)[st] - pts[st] - [dx, dy])
        assert (flow_err < 0.5).all(axis=1).mean() > 0.85

        # fail-safe: with a hopeless prior (40 px off), surviving status
        # points must still be accurate — wrong-but-confident flow would
        # poison PnP
        wild = jnp.broadcast_to(jnp.asarray([dx + 40.0, dy], jnp.float32),
                                (len(pts), 2))
        res_w = lk_track(p1, p2, jnp.asarray(pts), jnp.ones(len(pts), bool),
                         init_flow=wild, start_level=1)
        # the production filter is status AND err < tracking_error_thresh
        # (tracker.cpp:70-77; track_step applies both) — a wrong lock-on
        # reports low-confidence via err even when the GN iteration
        # "converged" somewhere
        st_w = np.asarray(res_w.status) & (np.asarray(res_w.err) < 30.0)
        if st_w.any():
            err_w = np.abs(np.asarray(res_w.uv)[st_w] - pts[st_w] - [dx, dy])
            assert (err_w < 1.0).all(axis=1).mean() > 0.8
