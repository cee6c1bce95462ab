"""On-device batched augmentations (run inside the jitted train step).

TPU-first counterpart of the reference's per-sample CPU augmentations:
each function maps a PRNG key + batch arrays to augmented arrays, is
jit/vmap-friendly, and draws one independent sample per cloud in the
batch — so augmentation costs nothing on the host and overlaps with
the step on device.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "random_scale",
    "random_rotate",
    "random_translate_global",
    "random_normals",
    "augment_classification",
]


def random_scale(key, pos, normal=None, scales=(2.0 / 3.0, 3.0 / 2.0)):
    """Per-cloud anisotropic scaling; normals get the inverse scale and
    are renormalized (reference random_scale.py semantics, batched)."""
    b = pos.shape[0]
    s = jax.random.uniform(
        key, (b, 1, 3), minval=scales[0], maxval=scales[1], dtype=pos.dtype
    )
    pos = pos * s
    if normal is not None:
        n = normal / s
        n = n / jnp.maximum(
            jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12
        )
        return pos, n
    return pos, None


def _rotation_matrices(angle, axis: int):
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    if axis == 0:
        rows = [[one, zero, zero], [zero, c, s], [zero, -s, c]]
    elif axis == 1:
        rows = [[c, zero, -s], [zero, one, zero], [s, zero, c]]
    else:
        rows = [[c, s, zero], [-s, c, zero], [zero, zero, one]]
    return jnp.stack(
        [jnp.stack(r, axis=-1) for r in rows], axis=-2
    )  # [B, 3, 3]


def random_rotate(key, pos, normal=None, degrees=180.0, axis: int = 0):
    """Per-cloud rotation about one axis, uniform in +-degrees."""
    b = pos.shape[0]
    ang = jax.random.uniform(
        key, (b,), minval=-abs(degrees), maxval=abs(degrees)
    ) * (jnp.pi / 180.0)
    R = _rotation_matrices(ang.astype(pos.dtype), axis)
    pos = jnp.einsum("bnd,bde->bne", pos, R)
    if normal is not None:
        normal = jnp.einsum("bnd,bde->bne", normal, R)
    return pos, normal


def random_translate_global(key, pos, translate=0.1):
    """One global offset per cloud (keeps local structure)."""
    b = pos.shape[0]
    t = jax.random.uniform(
        key, (b, 1, 3), minval=-abs(translate), maxval=abs(translate),
        dtype=pos.dtype,
    )
    return pos + t


def random_normals(key, normal, translate=0.1):
    """Per-point normal jitter + renormalize."""
    jit = jax.random.uniform(
        key, normal.shape, minval=-abs(translate), maxval=abs(translate),
        dtype=normal.dtype,
    )
    n = normal + jit
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-5)


def augment_classification(key, pos, normal=None,
                           scales=(4.0 / 5.0, 5.0 / 4.0),
                           translate: float = 0.1):
    """The reference ModelNet train-time augmentation
    (train_modelnet.py:38-39): RandomScale(4/5, 5/4) +
    RandomTranslateGlobal(0.1), batched on device."""
    k1, k2 = jax.random.split(key)
    pos, normal = random_scale(k1, pos, normal, scales)
    pos = random_translate_global(k2, pos, translate)
    return pos, normal
