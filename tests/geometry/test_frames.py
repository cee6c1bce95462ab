"""Ports of the reference frame tests
(/root/reference/test/geometry/test_grad_div_mls.py:12-55)."""

import jax.numpy as jnp
import numpy as np

from deltaconv_tpu.geometry.frames import build_tangent_basis, estimate_basis
from deltaconv_tpu.geometry.knn import knn


def _assert_orthonormal_right_handed(normal, x_basis, y_basis, atol=1e-5):
    basis = np.stack([normal, x_basis, y_basis], axis=-1)
    btb = np.einsum("nij,nik->njk", basis, basis)
    np.testing.assert_allclose(
        btb, np.broadcast_to(np.eye(3), btb.shape), atol=atol
    )
    handed = np.sum(np.cross(x_basis, y_basis) * normal, axis=-1)
    assert np.all(handed > 0)


def test_build_tangent_basis(rng):
    normal = rng.random((100, 3)).astype(np.float32)
    normal /= np.maximum(np.linalg.norm(normal, axis=1, keepdims=True), 1e-8)

    xb, yb = build_tangent_basis(jnp.asarray(normal))
    _assert_orthonormal_right_handed(normal, np.asarray(xb), np.asarray(yb),
                                     atol=1e-5)


def test_estimate_basis_plane(rng):
    # Random points in the z=0 plane, rotated into a random frame.
    pos = np.concatenate(
        [rng.random((100, 2)), np.zeros((100, 1))], axis=1
    ).astype(np.float32)

    normal = rng.random((1, 3)).astype(np.float32)
    normal /= np.linalg.norm(normal)
    xb, yb = build_tangent_basis(jnp.asarray(normal))
    T = np.stack([np.asarray(xb)[0], np.asarray(yb)[0], normal[0]], axis=-1)
    pos = pos @ T.T

    nbr_idx, nbr_mask = knn(jnp.asarray(pos), 20)
    n_out, x_out, y_out = estimate_basis(jnp.asarray(pos), nbr_idx, nbr_mask)
    n_out, x_out, y_out = map(np.asarray, (n_out, x_out, y_out))

    _assert_orthonormal_right_handed(n_out, x_out, y_out, atol=1e-4)
    # Normal recovery (up to sign).
    align = np.abs(np.sum(normal * n_out, axis=1))
    np.testing.assert_allclose(align, 1.0, atol=1e-4)


def test_estimate_basis_orientation(rng):
    pos = np.concatenate(
        [rng.random((200, 2)) * 2 - 1, np.zeros((200, 1))], axis=1
    ).astype(np.float32)
    pos[:, 2] += 5.0  # plane at z=5 so pos points "up"

    nbr_idx, nbr_mask = knn(jnp.asarray(pos), 10)
    n_out, _, _ = estimate_basis(
        jnp.asarray(pos), nbr_idx, nbr_mask, orientation=jnp.asarray(pos)
    )
    # With orientation = pos, all normals must point away from the origin.
    assert np.all(np.asarray(n_out)[:, 2] > 0)
