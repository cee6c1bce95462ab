"""Ports of /root/reference/test/geometry/test_connection.py."""

import jax.numpy as jnp
import numpy as np

from deltaconv_tpu.geometry.connection import (
    angle_in_plane,
    build_transport,
    rotate_around,
)
from deltaconv_tpu.geometry.frames import build_tangent_basis


def test_rotate_around(rng):
    n = 1000
    v = rng.random((n, 3)).astype(np.float32)
    v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-8)
    axis, _ = map(np.asarray, build_tangent_basis(jnp.asarray(v)))

    v_j, axis_j = jnp.asarray(v), jnp.asarray(axis)

    # 90 degrees -> axis x v.
    out = np.asarray(rotate_around(v_j, axis_j, jnp.full((n,), np.pi / 2)))
    np.testing.assert_allclose(out, np.cross(axis, v), atol=1e-4)

    # 180 degrees -> -v.
    out = np.asarray(rotate_around(v_j, axis_j, jnp.full((n,), np.pi)))
    np.testing.assert_allclose(out, -v, atol=1e-4)

    # 360 degrees -> v, for any axis.
    out = np.asarray(rotate_around(v_j, axis_j, jnp.full((n,), 2 * np.pi)))
    np.testing.assert_allclose(out, v, atol=1e-4)
    rand_axis = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    out = np.asarray(rotate_around(v_j, rand_axis, jnp.full((n,), 2 * np.pi)))
    np.testing.assert_allclose(out, v, atol=1e-4)


def test_angle_in_plane(rng):
    n = 1000
    angle = (rng.random(n) * np.pi).astype(np.float32)
    u = np.zeros((n, 3), np.float32)
    u[:, 0] = 1
    v = np.stack(
        [np.cos(angle), np.sin(angle), np.zeros_like(angle)], axis=1
    )

    normal = rng.random((n, 3)).astype(np.float32)
    normal /= np.maximum(np.linalg.norm(normal, axis=1, keepdims=True), 1e-8)
    xb, yb = map(np.asarray, build_tangent_basis(jnp.asarray(normal)))
    T = np.stack([xb, yb, normal], axis=2)  # [n, 3, 3]

    u = np.einsum("nij,nj->ni", T, u).astype(np.float32)
    v = np.einsum("nij,nj->ni", T, v).astype(np.float32)

    out = np.asarray(
        angle_in_plane(jnp.asarray(u), jnp.asarray(v), jnp.asarray(normal))
    )
    assert not np.any(np.isnan(out))
    np.testing.assert_allclose(out, angle, atol=1e-3)


def test_build_transport(rng):
    n = 200
    tn = rng.random((n, 3)).astype(np.float32)
    tn /= np.maximum(np.linalg.norm(tn, axis=1, keepdims=True), 1e-8)
    tx, ty = map(np.asarray, build_tangent_basis(jnp.asarray(tn)))

    # Source x: target x rotated by a known angle around the normal...
    rotation_angle = (rng.random(n) * 2 * np.pi).astype(np.float32)
    sx = np.asarray(
        rotate_around(jnp.asarray(tx), jnp.asarray(tn),
                      jnp.asarray(rotation_angle))
    )
    # ...then the whole frame tilted around an in-plane axis.
    axis = np.array(
        rotate_around(jnp.asarray(tx), jnp.asarray(tn),
                      jnp.asarray(rng.random(n).astype(np.float32)))
    )
    axis /= np.maximum(np.linalg.norm(axis, axis=1, keepdims=True), 1e-8)
    basis_angle = (rng.random(n) * 0.5 * np.pi).astype(np.float32)
    sn = np.asarray(
        rotate_around(jnp.asarray(tn), jnp.asarray(axis),
                      jnp.asarray(basis_angle))
    )
    sx = np.asarray(
        rotate_around(jnp.asarray(sx), jnp.asarray(axis),
                      jnp.asarray(basis_angle))
    )

    conn = np.asarray(
        build_transport(
            jnp.asarray(tn), jnp.asarray(tx), jnp.asarray(ty),
            jnp.asarray(sn), jnp.asarray(sx), non_oriented=False,
        )
    )
    assert conn.shape == (n, 4)
    assert not np.any(np.isnan(conn))

    R = conn.reshape(n, 2, 2)
    # Norm preservation.
    v = rng.random((n, 2)).astype(np.float32)
    tv = np.einsum("nij,nj->ni", R, v)
    np.testing.assert_allclose(
        np.linalg.norm(tv, axis=1), np.linalg.norm(v, axis=1), atol=1e-4
    )
    # Transports [1, 0] to the construction angle.
    np.testing.assert_allclose(R[:, 0, 0], np.cos(rotation_angle), atol=1e-3)
    np.testing.assert_allclose(R[:, 1, 0], np.sin(rotation_angle), atol=1e-3)
