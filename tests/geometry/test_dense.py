"""Dense (MXU) operator form must match the coefficient (gather) form."""

import jax
import jax.numpy as jnp
import numpy as np

from deltaconv_tpu.geometry.dense import densify
from deltaconv_tpu.geometry.frames import estimate_basis
from deltaconv_tpu.geometry.grad_div import build_grad_div
from deltaconv_tpu.geometry.knn import knn
from deltaconv_tpu.geometry.operators import hodge_laplacian, laplacian


def _gd(rng, n=256, k=12):
    pos = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    nbr_idx, nbr_mask = knn(pos, k)
    normal, xb, yb = estimate_basis(pos, nbr_idx, nbr_mask)
    return build_grad_div(pos, normal, xb, yb, nbr_idx, nbr_mask)


def test_dense_matches_sparse(rng):
    gd = _gd(rng)
    dense = jax.jit(densify)(gd)

    x = jnp.asarray(rng.random((256, 4)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(gd.grad(x)), np.asarray(dense.grad(x)), atol=1e-5
    )
    v = jnp.asarray(rng.random((256, 2, 4)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(gd.div(v)), np.asarray(dense.div(v)), atol=1e-5
    )
    # Compositions through the operator API.
    np.testing.assert_allclose(
        np.asarray(laplacian(x, gd)), np.asarray(laplacian(x, dense)),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(hodge_laplacian(v, gd)),
        np.asarray(hodge_laplacian(v, dense)), atol=1e-4,
    )


def test_dense_masked_edges_are_zero(rng):
    # Mask out half the neighbor slots: dense rows must only mix valid
    # columns (coefficients of masked edges are zero by construction).
    n, k = 128, 10
    pos = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    nbr_idx, nbr_mask = knn(pos, k)
    mask = np.asarray(nbr_mask).copy()
    mask[:, 7:] = False
    normal, xb, yb = estimate_basis(pos, nbr_idx, jnp.asarray(mask))
    gd = build_grad_div(pos, normal, xb, yb, nbr_idx, jnp.asarray(mask))
    dense = densify(gd)

    x = jnp.asarray(rng.random((n, 2)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(gd.grad(x)), np.asarray(dense.grad(x)), atol=1e-5
    )


def test_dense_batched(rng):
    gds = [_gd(np.random.default_rng(s), n=128, k=8) for s in (0, 1)]
    gd_b = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *gds)
    dense_b = densify(gd_b)
    x = jnp.asarray(rng.random((2, 128, 3)).astype(np.float32))
    out_b = np.asarray(dense_b.grad(x))
    for i, gd in enumerate(gds):
        np.testing.assert_allclose(
            out_b[i], np.asarray(densify(gd).grad(x[i])), atol=1e-6
        )
