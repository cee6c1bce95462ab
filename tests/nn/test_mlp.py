"""Ports of /root/reference/test/nn/test_mlp.py."""

import jax
import jax.numpy as jnp
import numpy as np

from deltaconv_tpu.nn.mlp import (
    MLP,
    ScalarVectorIdentity,
    ScalarVectorMLP,
    VectorMLP,
)


def _init_apply(module, *args, train=True):
    variables = jax.jit(
        lambda *a: module.init(jax.random.PRNGKey(0), *a, train=False)
    )(*args)
    out, _ = jax.jit(
        lambda v, *a: module.apply(v, *a, train=train,
                                   mutable=["batch_stats"])
    )(variables, *args)
    return out


def test_mlp(rng):
    x = jnp.asarray(rng.random((10, 16)).astype(np.float32))

    out = _init_apply(MLP([32]), x)
    assert out.shape == (10, 32)
    assert not np.any(np.isnan(np.asarray(out)))

    out = _init_apply(MLP([32, 32, 64]), x)
    assert out.shape == (10, 64)
    assert not np.any(np.isnan(np.asarray(out)))


def test_vectormlp_equivariance(rng):
    n, c_in, c_out = 500, 16, 32
    v = jnp.asarray(rng.random((n, 2, c_in)).astype(np.float32))

    mlp1 = VectorMLP([c_out])
    mlp2 = VectorMLP([c_out, c_out, c_out])
    vars1 = jax.jit(lambda a: mlp1.init(jax.random.PRNGKey(1), a,
                                        train=False))(v)
    vars2 = jax.jit(lambda a: mlp2.init(jax.random.PRNGKey(2), a,
                                        train=False))(v)

    apply1 = jax.jit(lambda vv, a: mlp1.apply(vv, a, train=True,
                                              mutable=["batch_stats"])[0])
    apply2 = jax.jit(lambda vv, a: mlp2.apply(vv, a, train=True,
                                              mutable=["batch_stats"])[0])
    out1 = apply1(vars1, v)
    out2 = apply2(vars2, v)
    assert out1.shape == (n, 2, c_out)
    assert out2.shape == (n, 2, c_out)
    assert not np.any(np.isnan(np.asarray(out1)))
    assert not np.any(np.isnan(np.asarray(out2)))

    # Random per-point orthonormal T (rotation composed with optional
    # reflection): MLP(T v) == T MLP(v).
    angle = rng.random(n).astype(np.float32) * 2 * np.pi
    c, s = np.cos(angle), np.sin(angle)
    R = np.stack(
        [np.stack([c, s], axis=1), np.stack([-s, c], axis=1)], axis=1
    )
    reflect = np.where(rng.random(n) > 0.1, 1.0, -1.0).astype(np.float32)
    F = np.zeros((n, 2, 2), np.float32)
    F[:, 0, 0] = 1.0
    F[:, 1, 1] = reflect
    T = jnp.asarray(np.einsum("nij,njk->nik", F, R).astype(np.float32))

    tv = jnp.einsum("nij,njc->nic", T, v)
    for apply_fn, variables, out in ((apply1, vars1, out1),
                                     (apply2, vars2, out2)):
        mlp_tv = apply_fn(variables, tv)
        t_mlp_v = jnp.einsum("nij,njc->nic", T, out)
        # Activations are order +-3; 5e-5 absolute is float-roundoff
        # headroom (a real equivariance break is order-1 everywhere).
        np.testing.assert_allclose(
            np.asarray(mlp_tv), np.asarray(t_mlp_v), atol=5e-5
        )


def test_scalarvectormlp_identity(rng):
    n, c_in, c_out = 100, 16, 32
    x = jnp.asarray(rng.random((n, c_in)).astype(np.float32))
    v = jnp.asarray(rng.random((n, 2, c_in)).astype(np.float32))

    sv = ScalarVectorMLP([c_out], vector_stream=True)
    out = _init_apply(sv, (x, v))
    assert isinstance(out, tuple)
    assert out[0].shape == (n, c_out)
    assert out[1].shape == (n, 2, c_out)

    s_only = ScalarVectorMLP([c_out], vector_stream=False)
    out = _init_apply(s_only, x)
    assert out.shape == (n, c_out)
    out = _init_apply(s_only, (x, v))
    assert out.shape == (n, c_out)

    ident = ScalarVectorIdentity()
    out = ident.apply({}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))
