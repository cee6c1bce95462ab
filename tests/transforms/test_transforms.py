"""Transform behavior tests (reference semantics from SURVEY.md §2.5)."""

import numpy as np
import pytest

from deltaconv_tpu.data.cloud import Cloud
from deltaconv_tpu.transforms import (
    Compose,
    GeodesicFPS,
    NormalizeArea,
    NormalizeAxes,
    NormalizeScale,
    RandomNormals,
    RandomRotate,
    RandomScale,
    RandomTranslateGlobal,
    SamplePoints,
)


def _cloud(rng, n=100, with_normals=True):
    pos = (rng.random((n, 3)) * 4 - 2).astype(np.float32)
    normal = None
    if with_normals:
        normal = rng.random((n, 3)).astype(np.float32)
        normal /= np.linalg.norm(normal, axis=1, keepdims=True)
    return Cloud(pos=pos, normal=normal)


def _tetra():
    pos = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32
    )
    face = np.array([[0, 0, 0, 1], [1, 1, 2, 2], [2, 3, 3, 3]], np.int64)
    return Cloud(pos=pos, face=face, y=np.array([0, 1, 2, 3]))


def test_normalize_scale(rng):
    out = NormalizeScale()(_cloud(rng))
    r = np.linalg.norm(out.pos, axis=1).max()
    assert r <= 1.0 and r > 0.99
    mid = (out.pos.max(0) + out.pos.min(0)) / 2
    np.testing.assert_allclose(mid, 0.0, atol=1e-5)


def test_normalize_area():
    out = NormalizeArea()(_tetra())
    f = out.face
    e1 = out.pos[f[1]] - out.pos[f[0]]
    e2 = out.pos[f[2]] - out.pos[f[0]]
    area = np.linalg.norm(np.cross(e1, e2), axis=-1).sum() / 2
    np.testing.assert_allclose(area, 1.0, rtol=1e-5)


def test_normalize_axes(rng):
    pos = rng.random((200, 3)).astype(np.float32)
    pos[:, 0] *= 5.0  # widest axis first -> must be permuted to last
    out = NormalizeAxes()(Cloud(pos=pos))
    std = out.pos.std(axis=0)
    assert std[0] <= std[1] <= std[2]


def test_random_scale_normals_renormalized(rng):
    c = _cloud(rng)
    out = RandomScale((0.5, 2.0), seed=0)(c)
    np.testing.assert_allclose(
        np.linalg.norm(out.normal, axis=1), 1.0, atol=1e-5
    )
    # seeded -> reproducible
    out2 = RandomScale((0.5, 2.0), seed=0)(c)
    np.testing.assert_array_equal(out.pos, out2.pos)


def test_random_rotate_preserves_distances(rng):
    c = _cloud(rng)
    out = RandomRotate(180, axis=1, seed=1)(c)
    d_in = np.linalg.norm(c.pos[:50] - c.pos[50:], axis=1)
    d_out = np.linalg.norm(out.pos[:50] - out.pos[50:], axis=1)
    np.testing.assert_allclose(d_in, d_out, atol=1e-4)
    np.testing.assert_allclose(
        np.linalg.norm(out.normal, axis=1), 1.0, atol=1e-5
    )


def test_random_translate_global_rigid(rng):
    c = _cloud(rng)
    out = RandomTranslateGlobal(0.5, seed=2)(c)
    delta = out.pos - c.pos
    np.testing.assert_allclose(
        delta, np.broadcast_to(delta[0:1], delta.shape), atol=1e-6
    )


def test_random_normals_unit(rng):
    c = _cloud(rng)
    out = RandomNormals(0.3, seed=3)(c)
    np.testing.assert_allclose(
        np.linalg.norm(out.normal, axis=1), 1.0, atol=1e-4
    )
    assert not np.allclose(out.normal, c.normal)


def test_sample_points_on_surface(rng):
    c = _tetra()
    out = SamplePoints(256, include_normals=True, include_labels=True,
                       seed=4)(c)
    assert out.pos.shape == (256, 3)
    assert out.normal.shape == (256, 3)
    assert out.y.shape == (256,)
    assert out.face is None
    # Unit normals.
    np.testing.assert_allclose(
        np.linalg.norm(out.normal, axis=1), 1.0, atol=1e-5
    )
    # All sampled points inside the tetra bounding box.
    assert out.pos.min() >= -1e-6 and out.pos.max() <= 1.0 + 1e-6


def test_geodesic_fps_transform(rng):
    c = _cloud(rng, n=120)
    c = c.replace(y=rng.integers(0, 5, 120))
    out = GeodesicFPS(40, store_original=True, seed=5)(c)
    assert out.pos.shape == (40, 3)
    assert out.normal.shape == (40, 3)
    assert out.y.shape == (40,)
    assert out.sample_idx.shape == (40,)
    assert out.pos_original.shape == (120, 3)
    np.testing.assert_array_equal(out.pos, c.pos[out.sample_idx])

    # Tiling when the cloud is smaller than the request.
    small = _cloud(rng, n=10)
    out = GeodesicFPS(25, seed=6)(small)
    assert out.pos.shape == (25, 3)


def test_compose(rng):
    pipeline = Compose([
        NormalizeScale(),
        RandomScale((0.9, 1.1), seed=0),
        RandomTranslateGlobal(0.1, seed=0),
    ])
    out = pipeline(_cloud(rng))
    assert out.pos.shape == (100, 3)


def test_on_device_augment(rng):
    import jax
    import jax.numpy as jnp

    from deltaconv_tpu.transforms import augment_classification

    pos = jnp.asarray(rng.random((4, 64, 3)).astype(np.float32))
    nrm = jnp.asarray(rng.random((4, 64, 3)).astype(np.float32))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)

    aug = jax.jit(augment_classification)
    pos_a, nrm_a = aug(jax.random.PRNGKey(0), pos, nrm)
    assert pos_a.shape == pos.shape
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(nrm_a), axis=-1), 1.0, atol=1e-5
    )
    # Different clouds get different scales.
    ratio = np.asarray(pos_a[0] / pos[0]) - np.asarray(pos_a[1] / pos[1])
    assert np.abs(ratio).max() > 1e-4
