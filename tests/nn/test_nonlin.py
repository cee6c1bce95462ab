"""Ports of /root/reference/test/nn/test_nonlin.py."""

import jax
import jax.numpy as jnp
import numpy as np

from deltaconv_tpu.geometry.operators import norm
from deltaconv_tpu.nn.nonlin import BatchNorm, VectorNonLin


def test_batchnorm(rng):
    bn = BatchNorm()

    # 1. Zero variance over the batch -> all zeros.
    row = rng.random(10).astype(np.float32)
    x = jnp.asarray(np.stack([row] * 4, axis=0))
    variables = bn.init(jax.random.PRNGKey(0), x, train=False)
    out, _ = bn.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-3)
    assert not np.any(np.isnan(np.asarray(out)))

    # 2. Per-channel affine shift/scale invariance of the output.
    zeromean = np.array([2, 1, 0, -1, -2, 1.5, -1.5, 1, 1, -2], np.float32)
    shifts = np.array([1, 2, 3, 4, 5], np.float32)
    x = np.stack([zeromean] * 5, axis=1)
    x_shifted = x * shifts + shifts

    bn = BatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    out, _ = bn.apply(variables, jnp.asarray(x), train=True,
                      mutable=["batch_stats"])
    out_shifted, _ = bn.apply(variables, jnp.asarray(x_shifted), train=True,
                              mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_shifted), atol=1e-4
    )


def test_vectornonlin_identity_at_init(rng):
    # Without batchnorm, zero-initialized bias + ReLU on non-negative
    # norms is the identity.
    v = jnp.asarray(rng.random((10, 2, 4)).astype(np.float32))
    vnl = VectorNonLin(use_batchnorm=False)
    variables = vnl.init(jax.random.PRNGKey(0), v, train=False)
    out = vnl.apply(variables, v, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(v), atol=1e-6)
    assert not np.any(np.isnan(np.asarray(out)))


def test_vectornonlin_batchnorm_threshold():
    # Vectors along +-x / +-y with norms {0, .25, .5, .75, 1}, mean .5:
    # BN + ReLU must zero all norms <= 0.5 and keep directions intact.
    v_x = np.array([1, 0, -0.75, 0.25, 0.5, 0, 0, 0, 0, 0], np.float32)
    v_y = np.array([0, 0, 0, 0, 0, -1, 0, 0.75, -0.25, -0.5], np.float32)
    v_norm_gt = np.array([1, 0, 0.75, 0.25, 0.5, 1, 0, 0.75, 0.25, 0.5],
                         np.float32)[:, None]

    v = jnp.asarray(np.stack([v_x, v_y], axis=1)[..., None])  # [10, 2, 1]
    np.testing.assert_allclose(np.asarray(norm(v)), v_norm_gt, atol=1e-6)

    vnl = VectorNonLin(use_batchnorm=True)
    variables = vnl.init(jax.random.PRNGKey(0), v, train=False)
    out, _ = vnl.apply(variables, v, train=True, mutable=["batch_stats"])
    out = np.asarray(out)
    out_norm = np.asarray(norm(jnp.asarray(out)))

    np.testing.assert_array_equal(out_norm > 0, v_norm_gt > 0.5)
    np.testing.assert_array_equal(out_norm == 0, v_norm_gt <= 0.5)

    out_x, out_y = out[:, 0, 0], out[:, 1, 0]
    np.testing.assert_array_equal(out_x == 0, (v_x <= 0.5) & (v_x >= -0.5))
    np.testing.assert_array_equal(out_y == 0, (v_y <= 0.5) & (v_y >= -0.5))
    np.testing.assert_array_equal(out_x > 0, v_x > 0.5)
    np.testing.assert_array_equal(out_y > 0, v_y > 0.5)
    np.testing.assert_array_equal(out_x < 0, v_x < -0.5)
    np.testing.assert_array_equal(out_y < 0, v_y < -0.5)
