"""Point-sharded operator construction and application (the SP analog).

For clouds too large for one chip, the N points of a single cloud are
sharded over the mesh (SURVEY.md §2.7's "point/graph parallelism"):

* every device owns a contiguous row block of positions/features;
* kNN runs locally against an all-gathered position table (positions
  are 12 bytes/point — gathering them is cheap; features are not);
* each device builds the MLS operators for ITS points only (the
  neighborhoods reference global indices);
* operator application all-gathers the feature table once per apply
  (the unavoidable halo: neighborhoods are arbitrary), contracts
  locally, and leaves the result sharded.

Everything is expressed with ``shard_map`` + ``jax.lax`` collectives
over ICI; XLA schedules the all-gathers.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry.frames import build_tangent_basis, estimate_basis
from ..geometry.grad_div import GradDiv, build_grad_div
from ..geometry.knn import knn

__all__ = [
    "point_sharded_operators",
    "point_sharded_grad",
    "point_sharded_div",
    "point_sharded_laplacian",
]


def _local_knn(pos_local, pos_full, k, offset):
    """Top-k neighbors of local rows against the full table.

    Returns global indices with the self-loop pinned to slot 0.
    """
    n_local = pos_local.shape[0]
    sq_l = jnp.sum(pos_local * pos_local, axis=-1)
    sq_f = jnp.sum(pos_full * pos_full, axis=-1)
    d2 = sq_l[:, None] + sq_f[None, :] - 2.0 * jnp.dot(
        pos_local, pos_full.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    rows = offset + jnp.arange(n_local)
    cols = jnp.arange(pos_full.shape[0])
    d2 = jnp.where(rows[:, None] == cols[None, :], -2e30, d2)
    _, idx = jax.lax.top_k(-d2, k)
    return idx.astype(jnp.int32)


def point_sharded_operators(mesh: Mesh, pos, k: int, normal=None,
                            axis: str = "points",
                            kernel_width: float = 1.0,
                            regularizer: float = 0.001) -> GradDiv:
    """Builds row-sharded grad/div operators for ONE large cloud.

    Args:
      mesh: 1-D mesh with axis ``axis``.
      pos: ``[N, 3]`` (sharded or shardable on axis 0; N divisible by
        the mesh size).
      k: neighbors (incl. self).
      normal: optional ``[N, 3]`` unit normals.

    Returns:
      :class:`GradDiv` whose arrays are sharded on axis 0;
      ``nbr_idx`` holds GLOBAL point indices.
    """

    def build(pos_l, normal_l):
        ax = jax.lax.axis_index(axis)
        n_local = pos_l.shape[0]
        offset = ax * n_local
        pos_full = jax.lax.all_gather(pos_l, axis, tiled=True)

        nbr_idx = _local_knn(pos_l, pos_full, k, offset)
        if normal_l is None:
            nbr_n = _local_knn(pos_l, pos_full, min(10, k), offset)
            # estimate_basis gathers neighbor offsets from the full
            # table; center rows are the local ones.
            off = pos_full[nbr_n] - pos_l[:, None, :]
            cov = jnp.einsum("nkd,nke->nde", off, off,
                             precision=jax.lax.Precision.HIGHEST)
            from ..geometry.linalg import eigh3x3
            from ..geometry.utils import EPS, batch_dot, normalize

            _, vecs = eigh3x3(cov)
            n_ = normalize(vecs[..., 0], EPS)
            n_ = jnp.where(batch_dot(n_, pos_l) < 0, -n_, n_)
            xb = vecs[..., 2]
            xb = normalize(xb - batch_dot(xb, n_) * n_, EPS)
            yb = normalize(jnp.cross(n_, xb), EPS)
        else:
            n_ = normal_l
            xb, yb = build_tangent_basis(n_)

        # Frames of the NEIGHBORS are needed for the vector mapping:
        # all-gather the (cheap, 9-float) frame table.
        xb_full = jax.lax.all_gather(xb, axis, tiled=True)
        yb_full = jax.lax.all_gather(yb, axis, tiled=True)

        # Local WLS build: reuse the single-cloud math with the global
        # tables. build_grad_div indexes pos/x_basis/y_basis with
        # nbr_idx (global) but treats rows as centers, so pass the
        # full tables for gathers and the local slices as centers via
        # the center_idx-style path: simplest is to inline the steps.
        from ..geometry.grad_div import (
            fit_vector_mapping,
            gaussian_weights,
            weighted_least_squares,
        )

        off = pos_full[nbr_idx] - pos_l[:, None, :]
        u = jnp.sum(off * xb[:, None, :], axis=-1)
        v = jnp.sum(off * yb[:, None, :], axis=-1)
        coords = jnp.stack([u, v], axis=-1)
        dist = jnp.linalg.norm(off, axis=-1)

        # Per-cloud average edge length: global mean over the mesh.
        point_mean = jnp.mean(dist, axis=1)
        avg = jax.lax.pmean(jnp.mean(point_mean), axis)
        w = jnp.exp(-(dist**2) / jnp.maximum(
            (kernel_width * avg) ** 2, 1e-20))
        w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-5)

        wls = weighted_least_squares(coords, w, regularizer)
        grad_coef = wls[..., 1:3]

        # Global infinity norm.
        sum_abs = jnp.sum(jnp.abs(grad_coef), axis=1)
        row_norm = jnp.linalg.norm(sum_abs, axis=-1)
        inf_norm = jax.lax.pmax(jnp.max(row_norm), axis)
        grad_coef = jnp.where(inf_norm > 1e-5, grad_coef / inf_norm,
                              grad_coef)

        # Vector mapping with neighbor frames from the full tables.
        patch = jnp.sum(off * n_[:, None, :], axis=-1)
        coeff = jnp.einsum("nkc,nk->nc", wls, patch,
                           precision=jax.lax.Precision.HIGHEST)
        h_x = coeff[:, 1, None] + 2 * coeff[:, 3, None] * u \
            + coeff[:, 4, None] * v
        h_y = coeff[:, 2, None] + coeff[:, 4, None] * u \
            + 2 * coeff[:, 5, None] * v
        gamma_x = xb[:, None, :] + n_[:, None, :] * h_x[..., None]
        gamma_y = yb[:, None, :] + n_[:, None, :] * h_y[..., None]
        det = 1.0 + h_x**2 + h_y**2
        E, F, G = 1.0 + h_x**2, h_x * h_y, 1.0 + h_y**2
        inv_m = jnp.stack(
            [jnp.stack([G, -F], -1), jnp.stack([-F, E], -1)], -2
        ) / det[..., None, None]
        xb_j = xb_full[nbr_idx]
        yb_j = yb_full[nbr_idx]
        bt = jnp.stack([
            jnp.stack([jnp.sum(gamma_x * xb_j, -1),
                       jnp.sum(gamma_x * yb_j, -1)], -1),
            jnp.stack([jnp.sum(gamma_y * xb_j, -1),
                       jnp.sum(gamma_y * yb_j, -1)], -1),
        ], -2)
        vec_map = jnp.einsum("nkab,nkbc->nkac", inv_m, bt,
                             precision=jax.lax.Precision.HIGHEST)
        div_coef = jnp.einsum("nkd,nkde->nke", grad_coef, vec_map,
                              precision=jax.lax.Precision.HIGHEST)

        mask = jnp.ones(nbr_idx.shape, bool)
        return GradDiv(nbr_idx=nbr_idx, nbr_mask=mask,
                       grad_coef=grad_coef, div_coef=div_coef)

    spec_in = (P(axis), None if normal is None else P(axis))
    out_spec = GradDiv(nbr_idx=P(axis), nbr_mask=P(axis),
                       grad_coef=P(axis), div_coef=P(axis))
    return jax.shard_map(
        build, mesh=mesh, in_specs=spec_in, out_specs=out_spec,
        check_vma=False,
    )(pos, normal)


def _sharded_apply(mesh, axis, fn, gd, x):
    specs = GradDiv(nbr_idx=P(axis), nbr_mask=P(axis),
                    grad_coef=P(axis), div_coef=P(axis))
    return jax.shard_map(
        fn, mesh=mesh, in_specs=(specs, P(axis)), out_specs=P(axis),
        check_vma=False,
    )(gd, x)


def point_sharded_grad(mesh: Mesh, gd: GradDiv, x, axis: str = "points"):
    """``[N, C] (sharded) -> [N, 2, C] (sharded)``: all-gathers the
    scalar table once, contracts locally."""

    def fn(gd_l, x_l):
        x_full = jax.lax.all_gather(x_l, axis, tiled=True)
        xg = x_full[gd_l.nbr_idx]
        return jnp.einsum("nkd,nkc->ndc", gd_l.grad_coef, xg,
                          precision=jax.lax.Precision.HIGHEST)

    return _sharded_apply(mesh, axis, fn, gd, x)


def point_sharded_div(mesh: Mesh, gd: GradDiv, v, axis: str = "points"):
    """``[N, 2, C] (sharded) -> [N, C] (sharded)``."""

    def fn(gd_l, v_l):
        v_full = jax.lax.all_gather(v_l, axis, tiled=True)
        vg = v_full[gd_l.nbr_idx]
        return jnp.einsum("nkd,nkdc->nc", gd_l.div_coef, vg,
                          precision=jax.lax.Precision.HIGHEST)

    return _sharded_apply(mesh, axis, fn, gd, v)


def point_sharded_laplacian(mesh: Mesh, pos, x, k: int, normal=None,
                            axis: str = "points"):
    """End-to-end demo: sharded build + ``-div(grad(x))`` on one large
    cloud. All arrays sharded on axis 0 of the ``axis`` mesh dim."""
    gd = point_sharded_operators(mesh, pos, k, normal=normal, axis=axis)
    g = point_sharded_grad(mesh, gd, x, axis=axis)
    return -point_sharded_div(mesh, gd, g, axis=axis)
