"""Ports of /root/reference/test/geometry/test_operators.py in the
``[..., N, 2, C]`` layout."""

import jax.numpy as jnp
import numpy as np

from deltaconv_tpu.geometry.operators import I_J, J, norm


def _polar(rng, n, c):
    r = rng.random((n, c)).astype(np.float32)
    theta = (rng.random((n, c)) * 2 * np.pi).astype(np.float32)
    v = np.stack([r * np.cos(theta), r * np.sin(theta)], axis=1)  # [n, 2, c]
    return v, r


def test_norm(rng):
    v, r = _polar(rng, 100, 4)
    np.testing.assert_allclose(np.asarray(norm(jnp.asarray(v))), r, atol=1e-5)


def test_J(rng):
    v, r = _polar(rng, 100, 4)
    jv = np.asarray(J(jnp.asarray(v)))
    # Norm-preserving.
    np.testing.assert_allclose(
        np.linalg.norm(jv, axis=1), r, atol=1e-5
    )
    # Orthogonal to v per channel.
    dots = (jv * v).sum(axis=1)
    np.testing.assert_allclose(dots, 0.0, atol=1e-5)
    # J^2 = -I.
    jjv = np.asarray(J(J(jnp.asarray(v))))
    np.testing.assert_allclose(jjv, -v, atol=1e-6)


def test_I_J(rng):
    v, _ = _polar(rng, 50, 3)
    ij = np.asarray(I_J(jnp.asarray(v)))
    assert ij.shape == (50, 2, 6)
    np.testing.assert_allclose(ij[..., :3], v, atol=1e-7)
    np.testing.assert_allclose(ij[..., 3:], np.asarray(J(jnp.asarray(v))),
                               atol=1e-7)
