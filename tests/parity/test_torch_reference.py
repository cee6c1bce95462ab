"""Numeric cross-check against the reference implementation's math.

Every stage of the operator pipeline is compared number-for-number
against a float64 torch re-execution of the reference formulas
(tests/parity/torch_harness.py, mirroring
/root/reference/deltaconv/geometry/grad_div_mls.py). Any drift of the
JAX pipeline from the reference's semantics red-lines here.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from deltaconv_tpu.geometry import frames, grad_div
from deltaconv_tpu.geometry.knn import knn

from . import torch_harness as th

N, K = 96, 12


@pytest.fixture
def cloud(rng):
    """Random smooth-ish cloud + exact kNN (self in slot 0)."""
    pos = rng.random((N, 3)).astype(np.float64)
    pos[:, 2] = 0.15 * np.sin(4 * pos[:, 0]) + 0.1 * pos[:, 1] ** 2
    d = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
    idx = np.argsort(d, axis=1)[:, :K].astype(np.int32)
    assert (idx[:, 0] == np.arange(N)).all()
    normal = rng.normal(size=(N, 3))
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    return pos, idx, normal


def t64(a):
    return torch.from_numpy(np.asarray(a, np.float64))


def test_build_tangent_basis(cloud):
    _, _, normal = cloud
    want_x, want_y = th.tangent_basis(t64(normal))
    got_x, got_y = frames.build_tangent_basis(
        jnp.asarray(normal, jnp.float32))
    np.testing.assert_allclose(got_x, want_x.numpy(), atol=1e-6)
    np.testing.assert_allclose(got_y, want_y.numpy(), atol=1e-6)


def test_estimate_basis(cloud):
    pos, idx, _ = cloud
    want_n, want_x, _ = th.estimate_basis(t64(pos), torch.from_numpy(
        idx.astype(np.int64)), orientation=t64(pos))
    got_n, got_x, got_y = frames.estimate_basis(
        jnp.asarray(pos, jnp.float32), jnp.asarray(idx),
        orientation=jnp.asarray(pos, jnp.float32))
    # orientation pins the normal's sign; the x basis sign is an
    # arbitrary SVD/eigh convention, so compare |cosine|.
    np.testing.assert_allclose(
        np.sum(np.asarray(got_n) * want_n.numpy(), -1), 1.0, atol=1e-4)
    np.testing.assert_allclose(
        np.abs(np.sum(np.asarray(got_x) * want_x.numpy(), -1)), 1.0,
        atol=1e-4)
    # right-handedness: y = n x x
    np.testing.assert_allclose(
        np.asarray(got_y),
        np.cross(np.asarray(got_n), np.asarray(got_x)), atol=1e-5)


def test_coords_projected(cloud):
    pos, idx, normal = cloud
    xb, yb = th.tangent_basis(t64(normal))
    want = th.coords_projected(t64(pos), t64(normal), xb, yb,
                               torch.from_numpy(idx.astype(np.int64)))
    got = grad_div.coords_projected(
        jnp.asarray(pos, jnp.float32), jnp.asarray(normal, jnp.float32),
        jnp.asarray(xb.numpy(), jnp.float32),
        jnp.asarray(yb.numpy(), jnp.float32), jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


def test_gaussian_weights(cloud):
    pos, idx, _ = cloud
    dist = np.linalg.norm(pos[idx] - pos[:, None], axis=-1)
    want = th.gaussian_weights(t64(dist), kernel_width=1.0)
    got = grad_div.gaussian_weights(jnp.asarray(dist, jnp.float32))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-6)


def test_weighted_least_squares(cloud):
    """Reference explicit 6x6 inverse vs our unrolled Cholesky."""
    pos, idx, normal = cloud
    xb, yb = th.tangent_basis(t64(normal))
    coords = th.coords_projected(t64(pos), t64(normal), xb, yb,
                                 torch.from_numpy(idx.astype(np.int64)))
    dist = (t64(pos)[idx] - t64(pos)[:, None]).norm(dim=-1)
    weights = th.gaussian_weights(dist)
    want = th.weighted_least_squares(coords, weights, 0.001)
    got = grad_div.weighted_least_squares(
        jnp.asarray(coords.numpy(), jnp.float32),
        jnp.asarray(weights.numpy(), jnp.float32), 0.001)
    scale = np.max(np.abs(want.numpy()))
    np.testing.assert_allclose(np.asarray(got) / scale,
                               want.numpy() / scale, atol=2e-4)


def test_fit_vector_mapping(cloud):
    pos, idx, normal = cloud
    idx_t = torch.from_numpy(idx.astype(np.int64))
    xb, yb = th.tangent_basis(t64(normal))
    coords = th.coords_projected(t64(pos), t64(normal), xb, yb, idx_t)
    dist = (t64(pos)[idx] - t64(pos)[:, None]).norm(dim=-1)
    wls = th.weighted_least_squares(coords,
                                    th.gaussian_weights(dist), 0.001)
    want = th.fit_vector_mapping(t64(pos), t64(normal), xb, yb, idx_t,
                                 wls, coords)
    got = grad_div.fit_vector_mapping(
        jnp.asarray(pos, jnp.float32), jnp.asarray(normal, jnp.float32),
        jnp.asarray(xb.numpy(), jnp.float32),
        jnp.asarray(yb.numpy(), jnp.float32), jnp.asarray(idx),
        jnp.asarray(wls.numpy(), jnp.float32),
        jnp.asarray(coords.numpy(), jnp.float32))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-4)


def _dense_from_coefs(gd):
    """Our [N, K, 2] coefficient form -> the reference's interleaved
    dense grad [2N, N] / div [N, 2N] matrices."""
    n, k = gd.nbr_idx.shape
    grad = np.zeros((2 * n, n))
    div = np.zeros((n, 2 * n))
    idx = np.asarray(gd.nbr_idx)
    gc = np.asarray(gd.grad_coef, np.float64)
    dc = np.asarray(gd.div_coef, np.float64)
    rows = np.arange(n)
    for kk in range(k):
        cols = idx[:, kk]
        np.add.at(grad, (2 * rows, cols), gc[:, kk, 0])
        np.add.at(grad, (2 * rows + 1, cols), gc[:, kk, 1])
        np.add.at(div, (rows, 2 * cols), dc[:, kk, 0])
        np.add.at(div, (rows, 2 * cols + 1), dc[:, kk, 1])
    return grad, div


@pytest.mark.parametrize("normalized", [True, False])
def test_build_grad_div_dense_parity(cloud, normalized):
    """End-to-end: our operator build == the reference's sparse
    matrices, compared in dense form."""
    pos, idx, normal = cloud
    xb, yb = th.tangent_basis(t64(normal))
    want_g, want_d = th.build_grad_div(
        t64(pos), t64(normal), xb, yb,
        torch.from_numpy(idx.astype(np.int64)), normalized=normalized)

    gd = grad_div.build_grad_div(
        jnp.asarray(pos, jnp.float32), jnp.asarray(normal, jnp.float32),
        jnp.asarray(xb.numpy(), jnp.float32),
        jnp.asarray(yb.numpy(), jnp.float32), jnp.asarray(idx),
        normalized=normalized)
    got_g, got_d = _dense_from_coefs(gd)

    gs = np.max(np.abs(want_g.numpy()))
    np.testing.assert_allclose(got_g / gs, want_g.numpy() / gs,
                               atol=3e-4)
    ds = np.max(np.abs(want_d.numpy()))
    np.testing.assert_allclose(got_d / ds, want_d.numpy() / ds,
                               atol=3e-4)


def test_operator_application_parity(cloud, rng):
    """grad/div APPLICATION through our gather+einsum matches the
    reference's sparse matmul (dense here) on random signals,
    including the interleaved [2N, C] vector layout conversion."""
    pos, idx, normal = cloud
    xb, yb = th.tangent_basis(t64(normal))
    want_g, want_d = th.build_grad_div(
        t64(pos), t64(normal), xb, yb,
        torch.from_numpy(idx.astype(np.int64)))

    gd = grad_div.build_grad_div(
        jnp.asarray(pos, jnp.float32), jnp.asarray(normal, jnp.float32),
        jnp.asarray(xb.numpy(), jnp.float32),
        jnp.asarray(yb.numpy(), jnp.float32), jnp.asarray(idx))

    x = rng.random((N, 4))
    want_v = (want_g.numpy() @ x).reshape(N, 2, 4)
    got_v = gd.grad(jnp.asarray(x, jnp.float32))
    np.testing.assert_allclose(np.asarray(got_v), want_v, atol=2e-4)

    v = rng.random((N, 2, 4))
    want_s = want_d.numpy() @ v.reshape(2 * N, 4)
    got_s = gd.div(jnp.asarray(v, jnp.float32))
    np.testing.assert_allclose(np.asarray(got_s), want_s, atol=2e-4)


def test_knn_matches_reference_convention(cloud):
    """Our kNN (self slot 0, ascending distance) returns the same
    neighbor SETS as the brute-force reference graph."""
    pos, idx, _ = cloud
    got_idx, mask = knn(jnp.asarray(pos, jnp.float32), K)
    assert bool(mask.all())
    assert (np.asarray(got_idx[:, 0]) == np.arange(N)).all()
    for i in range(N):
        assert set(np.asarray(got_idx)[i].tolist()) == set(
            idx[i].tolist()), i
