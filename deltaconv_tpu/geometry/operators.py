"""Pointwise vector-field operators in the ``[..., N, 2, C]`` layout.

Reference: /root/reference/deltaconv/geometry/operators.py. The
reference stores a C-channel vector field on N points as interleaved
``[2N, C]`` rows; here it is ``[..., N, 2, C]`` — the component axis is
a size-2 sublane dimension and channels ride the 128-wide lanes, so
``J``/``norm`` are trivial register ops on TPU.

``grad``/``div`` arguments are :class:`~deltaconv_tpu.geometry.grad_div.GradDiv`
operator structs (applied via gather + einsum), not sparse matrices.
"""

from __future__ import annotations

import jax.numpy as jnp

from .utils import safe_norm

__all__ = ["norm", "J", "I_J", "curl", "laplacian", "hodge_laplacian"]


def norm(v):
    """Channelwise vector norms: ``[..., N, 2, C] -> [..., N, C]``.

    Uses the gradient-safe norm (zero subgradient at zero vectors, the
    PyTorch convention) — zero vectors are routine in the vector stream.
    """
    return safe_norm(v, axis=-2)


def J(v):
    """90-degree counter-clockwise rotation of a tangent vector field."""
    return jnp.stack([-v[..., 1, :], v[..., 0, :]], axis=-2)


def I_J(v):
    """Concatenate a vector field with its rotated copy along channels."""
    return jnp.concatenate([v, J(v)], axis=-1)


def curl(v, gd):
    """``curl v = -div (J v)`` (reference operators.py:23-27)."""
    return -gd.div(J(v))


def laplacian(x, gd):
    """``lap x = -div grad x`` (reference operators.py:29-33)."""
    return -gd.div(gd.grad(x))


def hodge_laplacian(v, gd):
    """``-(grad div + J grad curl) v`` (reference operators.py:35-46)."""
    grad_div_v = gd.grad(gd.div(v))
    j_grad_curl_v = J(gd.grad(curl(v, gd)))
    return -(grad_div_v + j_grad_curl_v)
