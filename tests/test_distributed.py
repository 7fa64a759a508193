"""Distributed backend on the virtual 8-device CPU mesh
(SURVEY.md section 4: multi-device without a cluster; golden-value checks
that distributed BA matches single-device BA within tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ros2_mono_vo_tpu.backend.ba import bundle_adjust
from ros2_mono_vo_tpu.parallel.mesh import make_mesh, OBS_AXIS
from ros2_mono_vo_tpu.parallel.dist_ba import distributed_bundle_adjust
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
