"""On-TPU parity tests for the production kernel forks.

The CPU suite (conftest.py) routes three hot-path forks through different
code than production TPU runs: Pallas patch-DMA vs XLA dynamic-slice
(ops/pallas/patch.py), `approx_max_k` vs exact `top_k` corner selection
(ops/features.py:_topk_scores), and the Jacobi eigensolvers whose TPU
numerics differ from CPU LAPACK-backed oracles. These tests run the REAL
TPU paths and pin them against their CPU-suite counterparts:

    VO_TEST_TPU=1 python -m pytest tests/test_tpu_parity.py -q

They skip (not fail) without VO_TEST_TPU so the hermetic CPU suite is
unaffected; `bench.py --parity` runs them on the chip before benchmarking.
"""

import os

import numpy as np
import pytest

TPU = bool(os.environ.get("VO_TEST_TPU"))

pytestmark = pytest.mark.skipif(
    not TPU, reason="VO_TEST_TPU=1 required (runs the real TPU kernel paths)")


@pytest.fixture(scope="module")
def jaxmod():
    import jax
    assert jax.default_backend() != "cpu", (
        "VO_TEST_TPU=1 but JAX default backend is cpu")
    return jax


class TestPatchDMA:
    def test_pallas_matches_xla_bitwise(self, jaxmod, rng):
        """The Pallas DMA gather and the dynamic-slice gather are the same
        memory operation; given the alignment contract they must agree
        bit-for-bit (ops/pallas/patch.py docstring)."""
        import jax.numpy as jnp
        from ros2_mono_vo_tpu.ops.pallas.patch import (
            _extract_pallas_batched, _extract_xla)
        h, w, ph, pw = 256, 512, 16, 128
        img = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
        ys = rng.integers(0, (h - ph) // 8 + 1, 64) * 8
        xs = rng.integers(0, (w - pw) // 128 + 1, 64) * 128
        origins = jnp.asarray(np.stack([ys, xs], 1).astype(np.int32))
        a = np.asarray(_extract_pallas_batched(img[None], origins[None],
                                               ph, pw)[0])
        b = np.asarray(_extract_xla(img, origins, ph, pw))
        np.testing.assert_array_equal(a, b)



class TestBatchedPatchDMA:
    def test_vmapped_matches_per_lane(self, jaxmod, rng):
        """The custom-vmap batched DMA kernel must agree bitwise with
        per-lane single-image extraction (the batched engine's entire LK
        front end rides on this rule)."""
        import jax
        import jax.numpy as jnp
        from ros2_mono_vo_tpu.ops.pallas.patch import extract_patches

        B, N, H, W, ph, pw = 4, 64, 192, 512, 32, 256
        imgs = jnp.asarray(rng.uniform(0, 255, (B, H, W)).astype(np.float32))
        ys = (rng.integers(0, (H - ph) // 8, (B, N)) * 8).astype(np.int32)
        xs = (rng.integers(0, (W - pw) // 128, (B, N)) * 128).astype(np.int32)
        orgs = jnp.stack([jnp.asarray(ys), jnp.asarray(xs)], -1)

        batched = jax.jit(jax.vmap(
            lambda im, o: extract_patches(im, o, ph, pw)))(imgs, orgs)
        for b in range(B):
            single = extract_patches(imgs[b], orgs[b], ph, pw)
            assert np.array_equal(np.asarray(batched[b]),
                                  np.asarray(single)), f"lane {b} mismatch"


class TestApproxTopK:
    def test_detection_recall_vs_exact_topk(self, jaxmod, rng, monkeypatch):
        """`approx_max_k` trades exactness for speed; the detector only
        needs the corner SET to be stable. Require >=90% of the exact-top-k
        detections to survive, and every survivor to carry the same
        response score."""
        import jax
        import jax.numpy as jnp
        from ros2_mono_vo_tpu.config import FrontendConfig
        from ros2_mono_vo_tpu.ops import features as F

        cfg = FrontendConfig(max_features=512, num_pyramid_levels=4)
        img = jnp.asarray(rng.uniform(0, 255, (240, 320)).astype(np.float32))
        approx = F.detect_and_describe(img, cfg)

        # monkeypatch guarantees restoration via the fixture lifecycle
        # (ADVICE round-2 #3 — a bare attribute swap leaks if the finally
        # block is ever refactored away)
        monkeypatch.setattr(F, "_topk_scores",
                            lambda flat, k: jax.lax.top_k(flat, k))
        jax.clear_caches()           # force retrace through the exact fork
        try:
            exact = F.detect_and_describe(img, cfg)
        finally:
            monkeypatch.undo()
            jax.clear_caches()

        uv_a = {tuple(p) for p in np.asarray(approx.uv[approx.valid]).round(2).tolist()}
        uv_e = [tuple(p) for p in np.asarray(exact.uv[exact.valid]).round(2).tolist()]
        assert len(uv_e) > 100
        recall = sum(p in uv_a for p in uv_e) / len(uv_e)
        assert recall >= 0.9, f"approx_max_k detection recall {recall:.3f}"


class TestJacobiOnTPU:
    def test_jacobi_eigh_vs_lapack(self, jaxmod, rng):
        from ros2_mono_vo_tpu.ops.linalg import jacobi_eigh
        A = rng.normal(size=(64, 9, 9)).astype(np.float32)
        A = A + np.swapaxes(A, -1, -2)
        w, V = jacobi_eigh(A)
        w, V = np.asarray(w), np.asarray(V)
        w_ref = np.linalg.eigvalsh(A.astype(np.float64))
        np.testing.assert_allclose(w, w_ref, atol=5e-4 * np.abs(w_ref).max())
        # eigenvector residual ||A v - w v||
        resid = np.einsum("bij,bjk->bik", A, V) - w[:, None, :] * V
        assert np.abs(resid).max() < 5e-3

    def test_svd3_vs_lapack(self, jaxmod, rng):
        from ros2_mono_vo_tpu.ops.linalg import svd3
        A = rng.normal(size=(64, 3, 3)).astype(np.float32)
        U, s, Vt = svd3(A)
        s_ref = np.linalg.svd(A.astype(np.float64), compute_uv=False)
        # f32 absolute floor: near-zero singular values carry O(eps*||A||)
        # error (~3e-4 here) regardless of algorithm
        np.testing.assert_allclose(np.asarray(s), s_ref, atol=6e-4)
        rec = np.einsum("bij,bj,bjk->bik", np.asarray(U), np.asarray(s),
                        np.asarray(Vt))
        np.testing.assert_allclose(rec, A, atol=1e-3)


class TestEngineSmokeOnTPU:
    def test_device_vo_tracks_on_chip(self, jaxmod):
        """End-to-end: the production DeviceMonoVO initializes and tracks a
        short synthetic sequence on the real chip (the path the bench
        measures), with finite bounded ATE."""
        from ros2_mono_vo_tpu.config import (VOConfig, FrontendConfig,
                                             TrackerConfig)
        from ros2_mono_vo_tpu.io.synthetic import SyntheticScene
        from ros2_mono_vo_tpu.io.trajectory import (ate_rmse,
                                                    trajectory_positions)
        from ros2_mono_vo_tpu.pipeline.device_vo import (DeviceMonoVO,
                                                         MODE_TRACKING)

        cfg = VOConfig(
            frontend=FrontendConfig(max_features=512, num_pyramid_levels=4,
                                    ransac_hypotheses=256, max_landmarks=4096,
                                    max_keyframes=16, max_track_points=256),
            tracker=TrackerConfig(min_observations_before_triangulation=60))
        scene = SyntheticScene(np.random.default_rng(3),
                               image_shape=(240, 320))
        poses = scene.camera_path(30, step=0.12, lateral=0.03)
        frames = np.stack([scene.render(T) for T in poses])
        vo = DeviceMonoVO(cfg, scene.K, scene.image_shape, seed=1, chunk=15)
        vo.process_chunk(frames[:15])
        outs = vo.process_chunk(frames[15:])
        assert np.asarray(outs.mode)[-1] == MODE_TRACKING
        est = trajectory_positions(vo.trajectory)
        stamps = [int(s) for s, _ in vo.trajectory]
        gt = np.stack([poses[i][:3, 3] for i in stamps])
        assert ate_rmse(est, gt) < 0.6
