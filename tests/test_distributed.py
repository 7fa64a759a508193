"""Distributed backend on the virtual 8-device CPU mesh
(SURVEY.md section 4: multi-device without a cluster; golden-value checks
that distributed BA matches single-device BA within tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ros2_mono_vo_tpu.backend.ba import bundle_adjust
from ros2_mono_vo_tpu.parallel.mesh import make_mesh, OBS_AXIS, LM_AXIS
from ros2_mono_vo_tpu.parallel.dist_ba import (
    distributed_bundle_adjust, landmark_sharded_bundle_adjust,
    partition_by_landmark)
from tests.test_ba import synth_ba_problem


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


class TestDistributedBA:
    def test_matches_single_device(self, mesh8, rng):
        prob, T_gt, _ = synth_ba_problem(rng, M=6, P=128, N=160)
        single = bundle_adjust(prob, iterations=8)
        dist = distributed_bundle_adjust(prob, mesh8, iterations=8)
        assert float(dist.initial_cost) == pytest.approx(
            float(single.initial_cost), rel=1e-4)
        assert float(dist.final_cost) == pytest.approx(
            float(single.final_cost), rel=1e-2, abs=1e-3)
        np.testing.assert_allclose(np.asarray(dist.T_cw),
                                   np.asarray(single.T_cw), atol=1e-3)
        np.testing.assert_allclose(np.asarray(dist.lm_xyz),
                                   np.asarray(single.lm_xyz), atol=5e-3)

    def test_uneven_obs_axis_padding(self, mesh8, rng):
        # N=150 not divisible by 8 -> padded internally, masked out
        prob, _, _ = synth_ba_problem(rng, M=4, P=96, N=150)
        single = bundle_adjust(prob, iterations=6)
        dist = distributed_bundle_adjust(prob, mesh8, iterations=6)
        assert float(dist.final_cost) == pytest.approx(
            float(single.final_cost), rel=1e-2, abs=1e-3)

    def test_subset_mesh(self, rng):
        mesh2 = make_mesh(2)
        prob, _, _ = synth_ba_problem(rng, M=4, P=64, N=96)
        single = bundle_adjust(prob, iterations=5)
        dist = distributed_bundle_adjust(prob, mesh2, iterations=5)
        assert float(dist.final_cost) == pytest.approx(
            float(single.final_cost), rel=1e-2, abs=1e-3)


class TestLandmarkShardedBA:
    """Landmark-axis sharding: H_ll/W/b_l device-local, only the reduced
    camera system is psum'd (SURVEY.md section 7 stage 8)."""

    def test_partition_preserves_problem(self, rng):
        prob, _, _ = synth_ba_problem(rng, M=5, P=100, N=140)
        part = partition_by_landmark(prob, 8)
        # same masked observation count
        assert int(part.obs_mask.sum()) == int(
            (prob.obs_mask & (prob.obs_lm >= 0)).sum())
        # every partitioned obs refers to the same landmark position
        P_pad = part.lm_xyz.shape[0]
        assert P_pad % 8 == 0
        p_loc = P_pad // 8
        lm = np.asarray(part.obs_lm)
        mask = np.asarray(part.obs_mask)
        n_s = lm.shape[1] // 8
        for d in range(8):
            blk = lm[:, d * n_s:(d + 1) * n_s]
            ok = mask[:, d * n_s:(d + 1) * n_s]
            assert ((blk[ok] >= 0) & (blk[ok] < p_loc)).all()

    def test_matches_single_device(self, mesh8, rng):
        prob, _, _ = synth_ba_problem(rng, M=6, P=128, N=160)
        single = bundle_adjust(prob, iterations=8)
        dist = landmark_sharded_bundle_adjust(prob, mesh8, iterations=8)
        assert float(dist.initial_cost) == pytest.approx(
            float(single.initial_cost), rel=1e-4)
        assert float(dist.final_cost) == pytest.approx(
            float(single.final_cost), rel=1e-2, abs=1e-3)
        np.testing.assert_allclose(np.asarray(dist.T_cw),
                                   np.asarray(single.T_cw), atol=1e-3)
        np.testing.assert_allclose(np.asarray(dist.lm_xyz),
                                   np.asarray(single.lm_xyz), atol=5e-3)

    def test_uneven_landmark_axis(self, mesh8, rng):
        # P=90 not divisible by 8 -> landmark axis padded, results truncated
        prob, _, _ = synth_ba_problem(rng, M=4, P=90, N=120)
        single = bundle_adjust(prob, iterations=6)
        dist = landmark_sharded_bundle_adjust(prob, mesh8, iterations=6)
        assert dist.lm_xyz.shape == prob.lm_xyz.shape
        assert float(dist.final_cost) == pytest.approx(
            float(single.final_cost), rel=1e-2, abs=1e-3)

    def test_lm_axis_mesh(self, rng):
        mesh = make_mesh(4, axis=LM_AXIS)
        prob, _, _ = synth_ba_problem(rng, M=4, P=64, N=96)
        single = bundle_adjust(prob, iterations=5)
        dist = landmark_sharded_bundle_adjust(prob, mesh, iterations=5)
        assert float(dist.final_cost) == pytest.approx(
            float(single.final_cost), rel=1e-2, abs=1e-3)
