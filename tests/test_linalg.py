"""Batched Jacobi eigh/svd vs numpy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from ros2_mono_vo_tpu.ops.linalg import jacobi_eigh, svd3, smallest_eigvec


class TestJacobiEigh:
    @pytest.mark.parametrize("n", [3, 4, 9, 12])
    def test_matches_numpy(self, rng, n):
        A = rng.normal(size=(64, n, n)).astype(np.float32)
        A = A + np.swapaxes(A, -1, -2)
        w, V = jacobi_eigh(jnp.asarray(A))
        w_np, V_np = np.linalg.eigh(A)
        np.testing.assert_allclose(np.asarray(w), w_np, rtol=1e-4, atol=1e-4)
        # eigenvector directions (sign-free): A v = w v
        Av = np.einsum("bij,bjk->bik", A, np.asarray(V))
        wV = np.asarray(w)[:, None, :] * np.asarray(V)
        np.testing.assert_allclose(Av, wV, atol=5e-3)

    def test_smallest_eigvec_null_space(self, rng):
        # construct rank-deficient A^T A with known null vector
        v = rng.normal(size=(32, 9)).astype(np.float32)
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        B = rng.normal(size=(32, 8, 9)).astype(np.float32)
        B = B - (B @ v[..., None]) * v[:, None, :]   # rows orthogonal to v
        AtA = np.einsum("bij,bik->bjk", B, B)
        ns = np.asarray(smallest_eigvec(jnp.asarray(AtA)))
        dots = np.abs(np.einsum("bi,bi->b", ns, v))
        assert dots.min() > 0.999

    def test_degenerate_repeated_eigenvalues(self):
        A = np.eye(4, dtype=np.float32)[None].repeat(8, 0) * 2.0
        w, V = jacobi_eigh(jnp.asarray(A))
        np.testing.assert_allclose(np.asarray(w), 2.0, atol=1e-6)
        VtV = np.einsum("bij,bik->bjk", np.asarray(V), np.asarray(V))
        np.testing.assert_allclose(VtV, np.eye(4)[None].repeat(8, 0), atol=1e-5)


class TestSVD3:
    def test_matches_numpy(self, rng):
        A = rng.normal(size=(64, 3, 3)).astype(np.float32)
        U, S, Vt = svd3(jnp.asarray(A))
        S_np = np.linalg.svd(A, compute_uv=False)
        np.testing.assert_allclose(np.asarray(S), S_np, rtol=1e-3, atol=1e-3)
        # reconstruction
        rec = np.einsum("bij,bj,bjk->bik", np.asarray(U), np.asarray(S),
                        np.asarray(Vt))
        np.testing.assert_allclose(rec, A, atol=5e-3)
        # orthogonality
        UtU = np.einsum("bij,bik->bjk", np.asarray(U), np.asarray(U))
        np.testing.assert_allclose(UtU, np.eye(3)[None].repeat(64, 0), atol=1e-4)

    def test_rank2_essential_like(self, rng):
        """Essential matrices have singular values (s, s, 0) — U must stay
        orthogonal for recoverPose."""
        for i in range(8):
            U0, _ = np.linalg.qr(rng.normal(size=(3, 3)))
            V0, _ = np.linalg.qr(rng.normal(size=(3, 3)))
            E = U0 @ np.diag([1.0, 1.0, 0.0]) @ V0.T
            U, S, Vt = svd3(jnp.asarray(E.astype(np.float32)[None]))
            # s3 floor is sqrt(f32 eigenvalue noise) ~ 3e-4; downstream code
            # re-projects to the (1,1,0) manifold anyway
            np.testing.assert_allclose(np.asarray(S)[0], [1, 1, 0], atol=5e-4)
            UtU = np.asarray(U)[0].T @ np.asarray(U)[0]
            np.testing.assert_allclose(UtU, np.eye(3), atol=1e-4)
            rec = np.asarray(U)[0] @ np.diag(np.asarray(S)[0]) @ np.asarray(Vt)[0]
            np.testing.assert_allclose(rec, E, atol=5e-4)
