"""Per-point tangent frame construction.

TPU-native equivalents of the reference's frame builders
(/root/reference/deltaconv/geometry/grad_div_mls.py:10-69):

* ``build_tangent_basis`` — frame from a given normal.
* ``estimate_basis`` — frame from a k-neighborhood via the covariance
  eigendecomposition. The reference takes the left singular vectors of
  the (un-centered) offset matrix; eigenvectors of ``M M^T`` are the
  same vectors, and the closed-form 3x3 eigh maps to the VPU instead of
  a batched SVD loop.

All functions are unbatched over clouds (``[N, ...]``); batch with
``jax.vmap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .linalg import eigh3x3
from .utils import EPS, batch_dot, normalize

__all__ = ["build_tangent_basis", "estimate_basis"]


def build_tangent_basis(normal):
    """Constructs an orthonormal tangent basis from unit normals.

    Mirrors reference semantics (grad_div_mls.py:50-69): pick test
    vector [1,0,0], or [0,1,0] where ``|n . x| > 0.9``; then
    ``x = testvec x n`` and ``y = n x x``, both normalized.

    Args:
      normal: ``[..., 3]`` unit normals.

    Returns:
      ``(x_basis, y_basis)``: each ``[..., 3]``.
    """
    dtype = normal.dtype
    e0 = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], dtype), normal.shape)
    e1 = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], dtype), normal.shape)
    testvec = jnp.where(jnp.abs(batch_dot(normal, e0)) > 0.9, e1, e0)

    x_basis = normalize(jnp.cross(testvec, normal), EPS)
    y_basis = normalize(jnp.cross(normal, x_basis), EPS)
    return x_basis, y_basis


@jax.jit
def estimate_basis(pos, nbr_idx, nbr_mask=None, orientation=None,
                   table=None):
    """Estimates per-point tangent frames from k-nearest neighborhoods.

    The normal is the eigenvector of the smallest eigenvalue of the
    neighborhood's (un-centered) offset covariance; the x basis that of
    the largest. Equivalent to the reference's SVD of the offset matrix
    (grad_div_mls.py:26-47) — ``U`` of ``svd(M)`` equals the
    eigenvectors of ``M M^T`` — but batched-closed-form on TPU.

    Args:
      pos: ``[N, 3]`` point positions.
      nbr_idx: ``[N, K]`` int32 neighbor indices (self-loop allowed;
        the zero offset contributes nothing).
      nbr_mask: optional ``[N, K]`` validity mask for padded neighbor
        slots (True = real edge).
      orientation: optional ``[N, 3]`` rough normal direction used to
        orient the estimated normals (the models pass ``pos``;
        deltanet_base.py:65).
      table: optional ``[N_total, 3]`` neighbor lookup table when
        ``nbr_idx`` holds global indices into a larger cloud than the
        local center rows ``pos`` (point-sharded build).

    Returns:
      ``(normal, x_basis, y_basis)``: each ``[N, 3]``, orthonormal and
      right-handed (``y = n x x``).
    """
    tab = pos if table is None else table
    offsets = tab[nbr_idx] - pos[:, None, :]  # [N, K, 3]
    if nbr_mask is not None:
        offsets = offsets * nbr_mask[..., None].astype(offsets.dtype)
    # Un-centered covariance, matching SVD of the raw offset matrix.
    cov = jnp.einsum("nkd,nke->nde", offsets, offsets,
                     precision=jax.lax.Precision.HIGHEST)  # [N, 3, 3]

    _, vecs = eigh3x3(cov)
    normal = normalize(vecs[..., 0], EPS)  # smallest eigenvalue
    x_basis = vecs[..., 2]  # largest eigenvalue

    if orientation is not None:
        normal = jnp.where(batch_dot(normal, orientation) < 0, -normal, normal)

    # Re-orthonormalize x against the (possibly flipped) normal and take
    # the cross product for a right-handed frame.
    x_basis = x_basis - batch_dot(x_basis, normal) * normal
    x_basis = normalize(x_basis, EPS)
    y_basis = normalize(jnp.cross(normal, x_basis), EPS)
    return normal, x_basis, y_basis
