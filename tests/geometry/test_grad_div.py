"""Ports of the reference MLS operator property tests
(/root/reference/test/geometry/test_grad_div_mls.py:58-401), adapted to
the dense ``[N, K]`` neighbor layout and the GradDiv coefficient form.
"""

import jax.numpy as jnp
import numpy as np

from deltaconv_tpu.geometry.connection import rotate_around
from deltaconv_tpu.geometry.frames import build_tangent_basis
from deltaconv_tpu.geometry.grad_div import (
    build_grad_div,
    coords_projected,
    fit_vector_mapping,
    gaussian_weights,
    weighted_least_squares,
)
from deltaconv_tpu.geometry.knn import knn
from deltaconv_tpu.geometry.operators import J, curl, laplacian


def _poly_basis_np(coords):
    u, v = coords[..., 0], coords[..., 1]
    return np.stack([np.ones_like(u), u, v, u * u, u * v, v * v], axis=-1)


def test_coords_projected(rng):
    # Paraboloid rotated into a random frame: projected coords must
    # recover the original (x, y) parameters.
    xy = (rng.random((100, 2)) * 2 - 1).astype(np.float32)
    xy[0] = 0
    z = (xy**2).sum(axis=1, keepdims=True)
    pos = np.concatenate([xy, z], axis=1) + rng.random(3).astype(np.float32)

    normal = rng.random((1, 3)).astype(np.float32)
    normal /= np.linalg.norm(normal)
    xb, yb = map(np.asarray, build_tangent_basis(jnp.asarray(normal)))
    T = np.stack([xb[0], yb[0], normal[0]], axis=-1)
    pos = (pos @ T.T).astype(np.float32)

    nbr_idx, _ = knn(jnp.asarray(pos), 20)
    out = coords_projected(
        jnp.asarray(pos),
        jnp.asarray(np.repeat(normal, 100, 0)),
        jnp.asarray(np.repeat(xb, 100, 0)),
        jnp.asarray(np.repeat(yb, 100, 0)),
        nbr_idx,
    )
    out = np.asarray(out)  # [100, 20, 2]
    true = xy[np.asarray(nbr_idx[0])] - xy[0]
    np.testing.assert_allclose(out[0], true, atol=1e-4)


def test_gaussian_weights(rng):
    dist = rng.random((50, 20)).astype(np.float32)
    w = np.asarray(gaussian_weights(jnp.asarray(dist)))
    assert not np.any(np.isnan(w))
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)

    # Monotone: closer -> higher weight.
    d = jnp.asarray([[0.1, 0.5, 1.0, 1.5, 2.0]], dtype=jnp.float32)
    w = np.asarray(gaussian_weights(d))[0]
    assert np.all(np.diff(w) < 0)

    # Masked slots get zero weight and do not break normalization.
    mask = np.ones((50, 20), dtype=bool)
    mask[:, 15:] = False
    w = np.asarray(gaussian_weights(jnp.asarray(dist), jnp.asarray(mask)))
    assert np.all(w[:, 15:] == 0)
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)


def test_weighted_least_squares(rng):
    N, k = 1000, 20
    coords = (rng.random((N, k, 2)) * 2 - 1).astype(np.float32)
    coords[:, 0] = 0  # center point

    B = _poly_basis_np(coords)  # [N, k, 6]
    coeff = rng.random((N, 6)).astype(np.float32)
    f = (B * coeff[:, None, :]).sum(-1)  # [N, k]

    dist = np.linalg.norm(coords, axis=-1)
    w = gaussian_weights(jnp.asarray(dist))

    # 1. Exact recovery without regularization.
    wls = np.asarray(weighted_least_squares(jnp.asarray(coords), w, 0.0))
    out = (wls * f[..., None]).sum(axis=1)
    np.testing.assert_allclose(out, coeff, atol=1e-3)

    # 2. Close under regularization.
    wls = np.asarray(weighted_least_squares(jnp.asarray(coords), w, 1e-5))
    out = (wls * f[..., None]).sum(axis=1)
    np.testing.assert_allclose(out, coeff, atol=5e-2)

    # 3. Robust to uniform noise.
    f_noise = f + (rng.random((N, k)) * 0.01 - 0.005).astype(np.float32)
    out = (wls * f_noise[..., None]).sum(axis=1)
    np.testing.assert_allclose(out, coeff, atol=1e-1)
    assert np.abs(out - coeff).mean() < 5e-2

    # 4. Robust to 5% outliers.
    outliers = (rng.random((N, k)) > 0.95) * rng.random((N, k)) * 0.1
    out = (wls * (f + outliers.astype(np.float32))[..., None]).sum(axis=1)
    np.testing.assert_allclose(out, coeff, atol=5e-1)
    assert np.abs(out - coeff).mean() < 5e-2


def _quadratic_patches(rng, N, k):
    """N quadratic patches of k samples with analytic frames.

    Returns pos [N*k, 3], frames [N*k, 3] each, per-patch coords
    [N, k, 2], and the analytic dfdx/dfdy at each sample.
    """
    coords = (rng.random((N, k, 2)) * 2 - 1).astype(np.float32)
    coords[:, 0] = 0
    c = rng.random((N, 3)).astype(np.float32)
    x, y = coords[..., 0], coords[..., 1]
    f = c[:, None, 0] * x**2 + c[:, None, 1] * x * y + c[:, None, 2] * y**2

    pos = np.concatenate(
        [coords.reshape(-1, 2), f.reshape(-1, 1)], axis=1
    ).astype(np.float32)

    dfdx = np.stack(
        [np.ones_like(x), np.zeros_like(x),
         2 * c[:, None, 0] * x + c[:, None, 1] * y], axis=-1
    ).reshape(-1, 3)
    dfdy = np.stack(
        [np.zeros_like(x), np.ones_like(x),
         c[:, None, 1] * x + 2 * c[:, None, 2] * y], axis=-1
    ).reshape(-1, 3)
    normal = np.cross(dfdx, dfdy)
    normal /= np.maximum(np.linalg.norm(normal, axis=1, keepdims=True), 1e-8)
    return pos, normal.astype(np.float32), dfdx.astype(np.float32), \
        dfdy.astype(np.float32), coords


def test_fit_vector_mapping(rng):
    N, k = 1000, 20
    pos, normal, dfdx, dfdy, coords = _quadratic_patches(rng, N, k)

    # Random in-plane rotation of every sample's basis (centers fixed).
    wts = (rng.random((N * k, 2)) + 1e-2).astype(np.float32)
    signs = np.where(rng.random((N * k, 2)) > 0.5, 1.0, -1.0)
    wts = wts * signs
    wts /= np.maximum(np.linalg.norm(wts, axis=1, keepdims=True), 1e-8)
    wts = wts.reshape(N, k, 2)
    wts[:, 0] = [1.0, 0.0]
    wts = wts.reshape(N * k, 2).astype(np.float32)

    x_basis = wts[:, :1] * dfdx + wts[:, 1:] * dfdy
    x_basis /= np.maximum(np.linalg.norm(x_basis, axis=1, keepdims=True), 1e-8)
    y_basis = np.cross(normal, x_basis)

    nbr_idx = (np.arange(N)[:, None] * k + np.arange(k)[None, :]).astype(
        np.int32
    )
    center_idx = (np.arange(N) * k).astype(np.int32)

    dist = np.linalg.norm(coords, axis=-1)
    w = gaussian_weights(jnp.asarray(dist))
    wls = weighted_least_squares(jnp.asarray(coords), w, 0.0)

    vm = np.asarray(
        fit_vector_mapping(
            jnp.asarray(pos), jnp.asarray(normal), jnp.asarray(x_basis),
            jnp.asarray(y_basis), jnp.asarray(nbr_idx), wls,
            jnp.asarray(coords), center_idx=jnp.asarray(center_idx),
        )
    )
    assert vm.shape == (N, k, 2, 2)
    assert not np.any(np.isnan(vm))

    vm = vm.reshape(N * k, 2, 2)
    # Mapping [1,0] (neighbor x) through the patch frame recovers e_j^x.
    recon_x = vm[:, 0, 0, None] * dfdx + vm[:, 1, 0, None] * dfdy
    np.testing.assert_allclose(recon_x, x_basis, atol=1e-4)
    recon_y = vm[:, 0, 1, None] * dfdx + vm[:, 1, 1, None] * dfdy
    np.testing.assert_allclose(recon_y, y_basis, atol=1e-4)


def _surface(rng, N=1000, k=20):
    """Random quadratic height field with analytic frames (reference
    test_build_grad_div setup, grad_div_mls.py tests :278-330)."""
    coords = (rng.random((N, 2)) * 2 - 1).astype(np.float32)
    B = _poly_basis_np(coords)
    c = rng.random(6).astype(np.float32)
    f = (B * c[None, :]).sum(-1, keepdims=True)
    pos = np.concatenate([coords, f], axis=1).astype(np.float32)

    x, y = coords[:, 0], coords[:, 1]
    dfdx = np.stack(
        [np.ones_like(x), np.zeros_like(x), c[1] + 2 * c[3] * x + c[4] * y],
        axis=1,
    )
    dfdy = np.stack(
        [np.zeros_like(x), np.ones_like(x), c[2] + c[4] * x + 2 * c[5] * y],
        axis=1,
    )
    normal = np.cross(dfdx, dfdy)
    normal /= np.maximum(np.linalg.norm(normal, axis=1, keepdims=True), 1e-8)
    x_basis = dfdx / np.maximum(
        np.linalg.norm(dfdx, axis=1, keepdims=True), 1e-8
    )
    y_basis = np.cross(normal, x_basis)
    return (pos, normal.astype(np.float32), x_basis.astype(np.float32),
            y_basis.astype(np.float32), f.astype(np.float32))


def test_build_grad_div(rng):
    N, k = 1000, 20
    pos, normal, x_basis, y_basis, f = _surface(rng, N, k)

    nbr_idx, nbr_mask = knn(jnp.asarray(pos), k)
    gd = build_grad_div(
        jnp.asarray(pos), jnp.asarray(normal), jnp.asarray(x_basis),
        jnp.asarray(y_basis), nbr_idx, nbr_mask,
        regularizer=1e-8, normalized=False,
    )

    # 1. Shapes.
    assert gd.grad_coef.shape == (N, k, 2)
    assert gd.div_coef.shape == (N, k, 2)

    # 2. No NaNs through application.
    rand_x = jnp.asarray(rng.random((N, 1)).astype(np.float32))
    rand_v = jnp.asarray(rng.random((N, 2, 1)).astype(np.float32))
    assert not np.any(np.isnan(np.asarray(gd.grad(rand_x))))
    assert not np.any(np.isnan(np.asarray(gd.div(rand_v))))

    # 3. De Rham complex properties.
    ones = jnp.ones((N, 1), jnp.float32)
    # 3a. grad const = 0.
    np.testing.assert_allclose(np.asarray(gd.grad(ones)), 0.0, atol=1e-2)
    # 3b. laplacian const ~ 0 (mean abs).
    assert np.abs(np.asarray(laplacian(ones, gd))).mean() < 1e-2
    # 3c. laplacian of a random function is nonzero.
    assert np.abs(np.asarray(laplacian(rand_x, gd))).sum() > 0
    # 3d. curl grad x ~ 0.
    gx = gd.grad(jnp.asarray(pos[:, :1]))
    assert np.mean(np.asarray(curl(gx, gd)) ** 2) < 1e-2
    assert np.median(np.asarray(curl(gx, gd)) ** 2) < 1e-2
    # 3e. div co-grad x ~ 0.
    assert np.mean(np.asarray(gd.div(J(gx))) ** 2) < 1e-2
    assert np.median(np.asarray(gd.div(J(gx))) ** 2) < 1e-2

    # 4. Analytic gradient: f is a height map, so grad f projects
    # [0,0,1] onto the tangent frame.
    gf = np.asarray(gd.grad(jnp.asarray(f)))  # [N, 2, 1]
    np.testing.assert_allclose(gf[:, 0, 0], x_basis[:, 2], atol=1e-2)
    np.testing.assert_allclose(gf[:, 1, 0], y_basis[:, 2], atol=1e-2)

    # Mean curvature: laplacian of positions points along -normal.
    mc = np.asarray(laplacian(jnp.asarray(pos), gd))
    lhs = -np.sum(mc * normal, axis=1)
    rhs = np.linalg.norm(mc, axis=1)
    np.testing.assert_allclose(lhs, rhs, atol=1e-2)


def test_build_grad_div_coordinate_equivariance(rng):
    N, k = 1000, 20
    pos, normal, x_basis, y_basis, _ = _surface(rng, N, k)
    nbr_idx, nbr_mask = knn(jnp.asarray(pos), k)

    angles = (rng.random(N) * 2 * np.pi).astype(np.float32)
    x_rot = np.asarray(
        rotate_around(jnp.asarray(x_basis), jnp.asarray(normal),
                      jnp.asarray(angles))
    )
    y_rot = np.cross(normal, x_rot)

    x = jnp.asarray(rng.random((N, 1)).astype(np.float32))

    # The property is exact in infinite precision without the infinity-
    # norm normalization; with it, the normalizer itself is only
    # approximately rotation-invariant (it is an L1-type norm of basis
    # components), so the normalized case gets a looser relative bound.
    for normalized, rel_tol in ((False, 5e-3), (True, 0.15)):
        gd = build_grad_div(
            jnp.asarray(pos), jnp.asarray(normal), jnp.asarray(x_basis),
            jnp.asarray(y_basis), nbr_idx, nbr_mask, regularizer=1e-8,
            normalized=normalized,
        )
        gd_rot = build_grad_div(
            jnp.asarray(pos), jnp.asarray(normal), jnp.asarray(x_rot),
            jnp.asarray(y_rot), nbr_idx, nbr_mask, regularizer=1e-8,
            normalized=normalized,
        )

        # 5a. Gradients agree in ambient space (relative to the field
        # magnitude — the raw operators have O(100) coefficients here).
        g = np.asarray(gd.grad(x))[:, :, 0]
        g_rot = np.asarray(gd_rot.grad(x))[:, :, 0]
        amb = g[:, :1] * x_basis + g[:, 1:] * y_basis
        amb_rot = g_rot[:, :1] * x_rot + g_rot[:, 1:] * y_rot
        scale = np.abs(amb).max()
        assert np.abs(amb - amb_rot).max() < rel_tol * scale

        # 5b. div grad x is coordinate-independent.
        dg = np.asarray(gd.div(gd.grad(x)))
        dg_rot = np.asarray(gd_rot.div(gd_rot.grad(x)))
        assert np.abs(dg - dg_rot).max() < rel_tol * np.abs(dg).max()
