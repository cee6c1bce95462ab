"""Anisotropic-diffusion study: component and claim tests."""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(__file__), "..", "..", "experiments",
    "anisotropic_diffusion",
))

from architectures import ALL_NETS, ConvNet, DeltaNet  # noqa: E402
from diffusion import (  # noqa: E402
    anisotropic_diffusion_nsteps,
    laplacian,
    spatial_gradient,
    make_test_image,
)
from run_study import train_net  # noqa: E402


def test_spatial_gradient_linear_ramp():
    # Gradient of a linear x-ramp: constant in x, zero in y (interior).
    size = 16
    xx = np.tile(np.arange(size, dtype=np.float32), (size, 1))
    img = jnp.asarray(xx[None, :, :, None])
    gx, gy = spatial_gradient(img)
    np.testing.assert_allclose(
        np.asarray(gx)[0, 4:-4, 4:-4, 0], 1.0, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gy)[0, 4:-4, 4:-4, 0], 0.0, atol=1e-5
    )


def test_laplacian_of_quadratic():
    size = 16
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    img = jnp.asarray((xx**2 + yy**2)[None, :, :, None])
    lap = np.asarray(laplacian(img))[0, 4:-4, 4:-4, 0]
    # 3x3 [1..1;-8..] kernel of x^2+y^2 = 12; kornia-style L1
    # normalization divides by 16 (see diffusion._LAPLACIAN).
    np.testing.assert_allclose(lap, 12.0 / 16.0, atol=1e-4)


def test_diffusion_preserves_flat_regions():
    img = jnp.ones((1, 32, 32, 1))
    out = anisotropic_diffusion_nsteps(img, 5)
    np.testing.assert_allclose(
        np.asarray(out)[0, 4:-4, 4:-4, 0], 1.0, atol=1e-4
    )


def test_architectures_forward_shapes():
    import jax

    img = jnp.asarray(make_test_image(32))
    for net_cls in ALL_NETS:
        model = net_cls(num_layers=2, out_channels=4, in_channels=1)
        params = model.init(jax.random.PRNGKey(0), img)
        out = model.apply(params, img)
        assert out.shape == img.shape, net_cls.net_name()
        assert not np.any(np.isnan(np.asarray(out)))


@pytest.mark.slow
def test_deltaconv_beats_isotropic_baselines():
    """The paper's Figure 2 claim: DeltaConv fits anisotropic diffusion
    better than the isotropic point-based baselines."""
    img = jnp.asarray(make_test_image(48))
    target = anisotropic_diffusion_nsteps(img, 5)

    from architectures import GCN, PointNet

    _, l1_delta = train_net(DeltaNet, img, target, 60, 4, 8, 1e-3)
    _, l1_point = train_net(PointNet, img, target, 60, 4, 8, 1e-3)
    _, l1_gcn = train_net(GCN, img, target, 60, 4, 8, 1e-3)
    assert np.isfinite(l1_delta)
    assert l1_delta < l1_point
    assert l1_delta < l1_gcn
