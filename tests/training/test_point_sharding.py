"""Point-sharded operators must match the single-device build."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deltaconv_tpu.geometry.frames import build_tangent_basis
from deltaconv_tpu.geometry.grad_div import build_grad_div
from deltaconv_tpu.geometry.knn import knn
from deltaconv_tpu.geometry.operators import laplacian
from deltaconv_tpu.parallel.point_sharding import (
    point_sharded_laplacian,
    point_sharded_operators,
)
from jax.sharding import Mesh


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_point_sharded_matches_single_device(rng):
    n, k = 512, 12
    pos = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    nrm = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    x = jnp.asarray(rng.random((n, 4)).astype(np.float32))

    # Single device reference.
    nbr, mask = knn(pos, k)
    xb, yb = build_tangent_basis(nrm)
    gd = build_grad_div(pos, nrm, xb, yb, nbr, mask)
    want = np.asarray(laplacian(x, gd))

    mesh = Mesh(np.asarray(jax.devices()), ("points",))
    got = np.asarray(
        point_sharded_laplacian(mesh, pos, x, k, normal=nrm)
    )
    np.testing.assert_allclose(got, want, atol=5e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_point_sharded_estimated_normals(rng):
    n, k = 256, 10
    pos = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    mesh = Mesh(np.asarray(jax.devices()), ("points",))
    gd = point_sharded_operators(mesh, pos, k)
    assert gd.grad_coef.shape == (n, k, 2)
    assert np.all(np.isfinite(np.asarray(gd.grad_coef)))
    # Global indices may exceed the local shard size.
    assert int(jnp.max(gd.nbr_idx)) >= n // 8
