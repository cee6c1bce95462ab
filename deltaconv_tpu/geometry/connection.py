"""Parallel transport (Levi-Civita connection) between tangent frames.

Reference: /root/reference/deltaconv/geometry/connection.py (itself a
reimplementation of geometry-central functionality). Produces, per
point pair, the 2x2 rotation (optionally composed with a reflection for
unoriented surfaces) that expresses a source frame's x axis in the
target frame after transporting it along the rotation aligning the two
normals.

All functions broadcast over leading axes; inputs are ``[..., 3]``.
"""

from __future__ import annotations

import jax.numpy as jnp

from .utils import batch_dot, normalize

__all__ = ["build_transport", "angle_in_plane", "rotate_around"]


def rotate_around(v, axis, angle):
    """Rotates vectors ``v`` around unit ``axis`` by ``angle`` (radians).

    Rodrigues-style via an in-plane orthonormal basis (reference
    connection.py:62-76). ``angle`` may be ``[...]`` or ``[..., 1]``.
    """
    if angle.ndim == v.ndim - 1:
        angle = angle[..., None]
    parallel = axis * batch_dot(v, axis)
    tangent = v - parallel
    t_norm = jnp.maximum(
        jnp.linalg.norm(tangent, axis=-1, keepdims=True), 1e-8
    )
    bx = tangent / t_norm
    by = jnp.cross(axis, bx)
    rotated = t_norm * (jnp.cos(angle) * bx + jnp.sin(angle) * by) + parallel
    return jnp.where(t_norm > 0, rotated, parallel)


def angle_in_plane(u, v, normal):
    """Signed angle from ``u`` to ``v`` in the plane orthogonal to ``normal``.

    Reference connection.py:50-59.
    """
    u_plane = normalize(u - batch_dot(u, normal) * normal, 1e-8)
    basis_y = normalize(jnp.cross(normal, u_plane), 1e-8)
    return jnp.arctan2(
        batch_dot(v, basis_y)[..., 0], batch_dot(v, u_plane)[..., 0]
    )


def build_transport(target_n, target_x, target_y, source_n, source_x,
                    non_oriented: bool = True):
    """2x2 connection coefficients transporting source frames to targets.

    For unoriented surfaces (``non_oriented=True``) the target frame is
    flipped when the normals disagree and a reflection is appended
    (reference connection.py:6-47).

    Args:
      target_n, target_x, target_y: ``[..., 3]`` target frames.
      source_n, source_x: ``[..., 3]`` source frames.

    Returns:
      ``[..., 4]`` rows ``(a, -b, b*conj, a*conj)`` of the 2x2 map —
      same packed layout as the reference.
    """
    inverted = batch_dot(source_n, target_n) < 0
    target_n = jnp.where(inverted, -target_n, target_n)
    target_y = jnp.where(inverted, -target_y, target_y)

    axis = jnp.cross(target_n, source_n)
    axis_norm = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    axis = jnp.where(axis_norm > 1e-6, axis / jnp.maximum(axis_norm, 1e-20),
                     source_x)

    angle = angle_in_plane(source_n, target_n, axis)
    sx_3d = rotate_around(source_x, axis, angle)
    sx = jnp.concatenate(
        [batch_dot(sx_3d, target_x), batch_dot(sx_3d, target_y)], axis=-1
    )
    sx_norm = jnp.linalg.norm(sx, axis=-1, keepdims=True)
    identity = jnp.zeros_like(sx).at[..., 0].set(1.0)
    sx = jnp.where(sx_norm > 1e-6, sx / jnp.maximum(sx_norm, 1e-20), identity)

    conj = jnp.ones(sx.shape[:-1], dtype=sx.dtype)
    if non_oriented:
        conj = jnp.where(inverted[..., 0], -conj, conj)

    return jnp.stack(
        [sx[..., 0], -sx[..., 1], sx[..., 1] * conj, sx[..., 0] * conj],
        axis=-1,
    )
