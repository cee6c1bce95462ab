"""Ports of /root/reference/test/geometry/test_fps.py plus seedability
and fallback checks."""

import numpy as np
import pytest

from deltaconv_tpu.cpp import load_library
from deltaconv_tpu.geometry.fps import (
    _geodesic_fps_python,
    euclidean_fps,
    geodesic_fps,
)


def test_fps_counts_and_uniqueness(rng):
    pts = rng.random((200, 3)).astype(np.float64)
    idx = geodesic_fps(pts, 50, seed=0)
    assert idx.shape == (50,)
    assert len(set(idx.tolist())) == 50  # FPS never repeats
    assert idx.min() >= 0 and idx.max() < 200


def test_fps_validation(rng):
    with pytest.raises(ValueError):
        geodesic_fps(rng.random((10, 2)), 5)
    with pytest.raises(ValueError):
        geodesic_fps(rng.random((10, 3)), 20)
    with pytest.raises(ValueError):
        geodesic_fps(np.zeros((0, 3)), 1)


def test_fps_seedable(rng):
    pts = rng.random((100, 3))
    a = geodesic_fps(pts, 20, seed=7)
    b = geodesic_fps(pts, 20, seed=7)
    np.testing.assert_array_equal(a, b)


def test_fps_native_matches_python_spread(rng):
    """Native and fallback produce equally well-spread samples (exact
    index equality is not required — tie-breaks may differ)."""
    if load_library() is None:
        pytest.skip("no C++ toolchain")
    pts = rng.random((150, 3))

    def min_pairwise(idx):
        sel = pts[idx]
        d = np.linalg.norm(sel[:, None] - sel[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        return d.min()

    native = geodesic_fps(pts, 30, seed=3)
    fallback = _geodesic_fps_python(
        np.ascontiguousarray(pts, np.float64), 30, 10, 3
    )
    assert min_pairwise(native) > 0.7 * min_pairwise(fallback)
    assert len(set(native.tolist())) == 30


def test_euclidean_fps_on_device(rng):
    import jax.numpy as jnp

    pts = jnp.asarray(rng.random((128, 3)).astype(np.float32))
    idx = np.asarray(euclidean_fps(pts, 32))
    assert len(set(idx.tolist())) == 32
