"""Pose-graph optimization + loop closure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from ros2_mono_vo_tpu.geometry.se3 import se3_exp, se3_inverse
from ros2_mono_vo_tpu.backend.pose_graph import (
    PoseGraph, optimize_pose_graph, odometry_edges)


def circle_poses(n, radius=5.0):
    """Ground-truth loop trajectory around a circle."""
    out = []
    for i in range(n):
        th = 2 * np.pi * i / n
        T = np.eye(4, dtype=np.float32)
        c, s = np.cos(th), np.sin(th)
        T[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        T[:3, 3] = [radius * np.sin(th), 0.0, radius * (1 - np.cos(th))]
        out.append(T)
    return np.stack(out)


class TestPoseGraph:
    def test_odometry_drift_corrected_by_loop_edge(self, rng):
        n = 24
        gt = circle_poses(n)
        # odometry edges with accumulated noise (drift)
        rel_meas = []
        for i in range(n - 1):
            T_rel = np.linalg.inv(gt[i]) @ gt[i + 1]
            noise = np.concatenate([rng.normal(0, 0.01, 3),
                                    rng.normal(0, 0.005, 3)]).astype(np.float32)
            rel_meas.append(np.asarray(se3_exp(jnp.asarray(noise))) @ T_rel)
        # integrate noisy odometry -> drifted initial poses
        est = [gt[0]]
        for i in range(n - 1):
            est.append(est[-1] @ rel_meas[i])
        est = np.stack(est)
        drift_before = np.linalg.norm(est[-1][:3, 3] - gt[-1][:3, 3])
        assert drift_before > 0.05  # there is drift to fix

        # edges: odometry chain + one loop edge last->first (exact)
        ei = list(range(n - 1)) + [n - 1]
        ej = list(range(1, n)) + [0]
        T_ij = rel_meas + [np.linalg.inv(gt[n - 1]) @ gt[0]]
        w = [1.0] * (n - 1) + [5.0]
        g = PoseGraph(
            T_w=jnp.asarray(est),
            edge_i=jnp.asarray(ei, jnp.int32),
            edge_j=jnp.asarray(ej, jnp.int32),
            T_ij=jnp.asarray(np.stack(T_ij).astype(np.float32)),
            edge_weight=jnp.asarray(w, jnp.float32),
            fixed=jnp.asarray(np.arange(n) == 0))
        T_opt, cost = optimize_pose_graph(g, iterations=25)
        T_opt = np.asarray(T_opt)
        # loop edge satisfied: end-to-start relative pose near ground truth
        rel = np.linalg.inv(T_opt[-1]) @ T_opt[0]
        rel_gt = np.linalg.inv(gt[-1]) @ gt[0]
        assert np.linalg.norm(rel[:3, 3] - rel_gt[:3, 3]) < 0.05
        # global positions closer to gt than the drifted input
        err_before = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=-1).mean()
        err_after = np.linalg.norm(T_opt[:, :3, 3] - gt[:, :3, 3], axis=-1).mean()
        assert err_after < 0.7 * err_before

    def test_fixed_pose_stays(self, rng):
        n = 6
        gt = circle_poses(n)
        ei, ej, T_ij, w = odometry_edges(jnp.asarray(gt), jnp.ones(n, bool))
        g = PoseGraph(T_w=jnp.asarray(gt), edge_i=ei, edge_j=ej, T_ij=T_ij,
                      edge_weight=w, fixed=jnp.asarray(np.arange(n) == 0))
        T_opt, cost = optimize_pose_graph(g, iterations=5)
        np.testing.assert_allclose(np.asarray(T_opt)[0], gt[0], atol=1e-6)
        assert float(cost) < 1e-6  # consistent input stays consistent

    def test_zero_weight_edges_ignored(self, rng):
        n = 5
        gt = circle_poses(n)
        ei, ej, T_ij, w = odometry_edges(jnp.asarray(gt), jnp.ones(n, bool))
        # poison an edge but zero its weight
        T_bad = T_ij.at[2].set(jnp.eye(4))
        w_masked = w.at[2].set(0.0)
        g = PoseGraph(T_w=jnp.asarray(gt), edge_i=ei, edge_j=ej, T_ij=T_bad,
                      edge_weight=w_masked, fixed=jnp.asarray(np.arange(n) == 0))
        T_opt, cost = optimize_pose_graph(g, iterations=5)
        assert float(cost) < 1e-6


class TestLoopClosure:
    def _build_map_with_revisit(self):
        """VO map from a synthetic out-and-back trajectory would be ideal;
        cheaper: construct a map whose first and last keyframes share
        landmarks and descriptors (a true revisit)."""
        from ros2_mono_vo_tpu.config import FrontendConfig
        from ros2_mono_vo_tpu.pipeline.state import empty_map, add_keyframe, MapState
        from ros2_mono_vo_tpu.geometry import project_points
        rng = np.random.default_rng(7)
        fcfg = FrontendConfig(max_features=256, max_landmarks=2048,
                              max_keyframes=16)
        m = empty_map(fcfg)
        n, B = 256, 256
        L = 200
        pts = np.stack([rng.uniform(-4, 4, L), rng.uniform(-3, 3, L),
                        rng.uniform(6, 14, L)], -1).astype(np.float32)
        desc = np.where(rng.random((L, B)) > 0.5, 1.0, -1.0).astype(np.float32)
        Kmat = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]], np.float32)
        m = m._replace(lm_xyz=m.lm_xyz.at[:L].set(jnp.asarray(pts)),
                       lm_valid=m.lm_valid.at[:L].set(True),
                       lm_count=jnp.int32(L))

        def kf_from_pose(T_wc, flip_desc_frac, with_ids):
            T_cw = np.linalg.inv(T_wc)
            uv, _ = project_points(jnp.asarray(Kmat), jnp.asarray(T_cw),
                                   jnp.asarray(pts))
            uv = np.asarray(uv)
            uvN = np.zeros((n, 2), np.float32)
            uvN[:L] = uv
            d = desc.copy()
            flip = rng.random((L, B)) < flip_desc_frac
            d[flip] *= -1
            dN = np.zeros((n, B), np.float32)
            dN[:L] = d
            ids = np.full(n, -1, np.int32)
            if with_ids:
                ids[:L] = np.arange(L)
            valid = np.zeros(n, bool)
            valid[:L] = True
            return (jnp.asarray(T_wc), jnp.asarray(uvN), jnp.asarray(ids),
                    jnp.asarray(valid), jnp.asarray(dN))

        # KF 0: origin (with landmark links)
        m = add_keyframe(m, *kf_from_pose(np.eye(4, dtype=np.float32), 0.02, True))
        # intermediate keyframes far away with unrelated random descriptors
        for i in range(12):
            T = np.eye(4, dtype=np.float32)
            T[:3, 3] = [50.0 + 5 * i, 0, 0]
            uvr = jnp.asarray(rng.uniform(0, 300, (n, 2)).astype(np.float32))
            dr = jnp.asarray(np.where(rng.random((n, B)) > 0.5, 1.0, -1.0)
                             .astype(np.float32))
            m = add_keyframe(m, jnp.asarray(T), uvr,
                             jnp.full((n,), -1, jnp.int32),
                             jnp.ones((n,), bool), dr)
        # KF 13: revisit of origin with slight offset + drifted stored pose
        T_true = np.eye(4, dtype=np.float32)
        T_true[:3, 3] = [0.3, 0.05, -0.2]
        T_drifted = T_true.copy()
        T_drifted[:3, 3] += [0.8, -0.4, 0.5]   # what odometry believes
        pose, uvN, ids, valid, dN = kf_from_pose(T_true, 0.02, False)
        m = add_keyframe(m, jnp.asarray(T_drifted), uvN, ids, valid, dN)
        return m, Kmat, T_true

    def test_detect_and_verify(self):
        from ros2_mono_vo_tpu.backend.loop_closure import detect_loop, verify_loop
        from ros2_mono_vo_tpu.pipeline.state import last_kf_slot
        m, Kmat, T_true = self._build_map_with_revisit()
        q = last_kf_slot(m)
        cand = detect_loop(m, q, min_gap=5, sim_thresh=0.5)
        assert bool(cand.ok)
        assert int(cand.slot) == 0
        con = verify_loop(m, cand.slot, q, jnp.asarray(Kmat),
                          jax.random.PRNGKey(0))
        assert bool(con.ok), f"inliers {int(con.n_inliers)}"
        # measured relative pose should match T_a^-1 @ T_true (a = origin)
        T_ab = np.asarray(con.T_ab)
        np.testing.assert_allclose(T_ab[:3, 3], T_true[:3, 3], atol=0.05)

    def test_close_loop_and_correct(self):
        """Full device-side closure: detect -> verify -> pose graph ->
        ring write-back + landmark re-anchor + current-pose correction."""
        from ros2_mono_vo_tpu.backend.loop_closure import close_loop_and_correct
        m, Kmat, T_true = self._build_map_with_revisit()
        lm_before = np.asarray(m.lm_xyz).copy()
        q_slot = 13
        T_drifted = np.asarray(m.kf_pose_wc[q_slot])
        err_before = np.linalg.norm(T_drifted[:3, 3] - T_true[:3, 3])
        assert err_before > 0.5  # there is drift to fix

        pose_cur = jnp.asarray(T_drifted)  # tracking pose = last KF pose
        m2, pose2, info = close_loop_and_correct(
            m, pose_cur, jnp.asarray(Kmat), jax.random.PRNGKey(0),
            min_gap=5, sim_thresh=0.5, reproj_thresh=4.0, min_inliers=30,
            pgo_iterations=20)
        assert bool(info.closed), f"inliers {int(info.n_inliers)}"
        assert int(info.cand_slot) == 0
        assert float(info.pg_cost1) < float(info.pg_cost0)

        # query keyframe pulled toward its true pose
        T_q_after = np.asarray(m2.kf_pose_wc[q_slot])
        err_after = np.linalg.norm(T_q_after[:3, 3] - T_true[:3, 3])
        assert err_after < 0.5 * err_before, (err_before, err_after)
        # current pose moved by the same correction as the query keyframe
        delta_kf = T_q_after @ np.linalg.inv(T_drifted)
        np.testing.assert_allclose(np.asarray(pose2),
                                   delta_kf @ T_drifted, atol=1e-4)
        # landmarks anchored to the (fixed) origin keyframe stay put
        L = 200
        np.testing.assert_allclose(np.asarray(m2.lm_xyz)[:L],
                                   lm_before[:L], atol=1e-4)

    def test_no_false_loop_on_distinct_scene(self):
        from ros2_mono_vo_tpu.backend.loop_closure import detect_loop
        from ros2_mono_vo_tpu.config import FrontendConfig
        from ros2_mono_vo_tpu.pipeline.state import empty_map, add_keyframe
        rng = np.random.default_rng(11)
        fcfg = FrontendConfig(max_features=128, max_landmarks=512,
                              max_keyframes=16)
        m = empty_map(fcfg)
        n, B = 128, 256
        for i in range(14):
            T = np.eye(4, dtype=np.float32)
            T[:3, 3] = [5.0 * i, 0, 0]
            d = jnp.asarray(np.where(rng.random((n, B)) > 0.5, 1.0, -1.0)
                            .astype(np.float32))
            m = add_keyframe(m, jnp.asarray(T),
                             jnp.asarray(rng.uniform(0, 300, (n, 2))
                                         .astype(np.float32)),
                             jnp.full((n,), -1, jnp.int32),
                             jnp.ones((n,), bool), d)
        from ros2_mono_vo_tpu.pipeline.state import last_kf_slot
        cand = detect_loop(m, last_kf_slot(m), min_gap=5, sim_thresh=0.5)
        assert not bool(cand.ok)
