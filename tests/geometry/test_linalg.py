"""Tests for the batched small-matrix linear algebra kernels."""

import jax.numpy as jnp
import numpy as np

from deltaconv_tpu.geometry.linalg import chol_solve, eigh3x3


def test_eigh3x3_matches_numpy(rng):
    M = rng.normal(size=(500, 3, 3)).astype(np.float32)
    A = M @ np.swapaxes(M, -1, -2)  # symmetric PSD

    w, V = eigh3x3(jnp.asarray(A))
    w = np.asarray(w)
    V = np.asarray(V)

    w_np, _ = np.linalg.eigh(A)
    # Ascending eigenvalues that match LAPACK, to f32 closed-form
    # accuracy (~1e-4 of the matrix scale; near-degenerate spectra are
    # the worst case).
    scale = np.abs(w_np).max(axis=-1, keepdims=True)
    np.testing.assert_allclose(w, w_np, atol=1e-3 * (1 + scale.max()))

    # Columns are unit eigenvectors: A v = w v.
    for i in range(3):
        av = np.einsum("bij,bj->bi", A, V[..., i])
        wv = w[:, i, None] * V[..., i]
        np.testing.assert_allclose(av, wv, atol=2e-3 * (1 + np.abs(w).max()))

    # Orthonormal.
    vtv = np.einsum("bji,bjk->bik", V, V)
    np.testing.assert_allclose(vtv, np.broadcast_to(np.eye(3), vtv.shape),
                               atol=1e-4)


def test_eigh3x3_degenerate():
    # Scalar matrix: all eigenvalues equal; must not produce NaNs.
    A = jnp.broadcast_to(2.0 * jnp.eye(3), (4, 3, 3))
    w, V = eigh3x3(A)
    assert not np.any(np.isnan(np.asarray(w)))
    assert not np.any(np.isnan(np.asarray(V)))
    np.testing.assert_allclose(np.asarray(w), 2.0, atol=1e-6)


def test_chol_solve_matches_numpy(rng):
    n, m, b = 6, 20, 200
    M = rng.normal(size=(b, n, n)).astype(np.float32)
    A = M @ np.swapaxes(M, -1, -2) + 0.1 * np.eye(n, dtype=np.float32)
    rhs = rng.normal(size=(b, n, m)).astype(np.float32)

    x = np.asarray(chol_solve(jnp.asarray(A), jnp.asarray(rhs)))
    x_np = np.linalg.solve(A, rhs)
    np.testing.assert_allclose(x, x_np, rtol=2e-3, atol=2e-3)
