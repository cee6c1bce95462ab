"""Tests for the static-shape brute-force kNN."""

import jax.numpy as jnp
import numpy as np

from deltaconv_tpu.geometry.knn import knn, knn_tiled


def _ref_knn(pos, k):
    d2 = ((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, -1.0)
    return np.argsort(d2, axis=1, kind="stable")[:, :k]


def test_knn_matches_bruteforce(rng):
    pos = rng.random((300, 3)).astype(np.float32)
    k = 12
    idx, mask = knn(jnp.asarray(pos), k)
    idx = np.asarray(idx)
    assert np.all(np.asarray(mask))
    # Self-loop in slot 0.
    np.testing.assert_array_equal(idx[:, 0], np.arange(300))
    # Same neighbor distances as numpy (near-equal distances may swap
    # indices under the f32 |x|^2 + |y|^2 - 2xy expansion; compare the
    # sorted distance profile instead of exact index sets).
    ref = _ref_knn(pos, k)
    d_ref = np.sort(
        np.linalg.norm(pos[ref] - pos[:, None, :], axis=-1), axis=1
    )
    d_out = np.sort(
        np.linalg.norm(pos[idx] - pos[:, None, :], axis=-1), axis=1
    )
    np.testing.assert_allclose(d_out, d_ref, atol=1e-5)


def test_knn_point_mask(rng):
    pos = rng.random((64, 3)).astype(np.float32)
    point_mask = np.ones(64, dtype=bool)
    point_mask[50:] = False
    idx, mask = knn(jnp.asarray(pos), 8, jnp.asarray(point_mask))
    idx = np.asarray(idx)
    mask = np.asarray(mask)
    # Valid rows never reference masked points on valid slots.
    assert np.all(idx[:50][mask[:50]] < 50)


def test_knn_tiled_matches_knn(rng):
    pos = rng.random((500, 3)).astype(np.float32)
    k = 16
    idx_a, _ = knn(jnp.asarray(pos), k)
    idx_b, mask_b = knn_tiled(jnp.asarray(pos), k, tile=128)
    assert np.all(np.asarray(mask_b))
    d_a = np.sort(
        np.linalg.norm(pos[np.asarray(idx_a)] - pos[:, None, :], axis=-1),
        axis=1,
    )
    d_b = np.sort(
        np.linalg.norm(pos[np.asarray(idx_b)] - pos[:, None, :], axis=-1),
        axis=1,
    )
    np.testing.assert_allclose(d_a, d_b, atol=1e-5)
