"""The DeltaConv layer: coordinate-independent scalar+vector convolution.

Reference: /root/reference/deltaconv/nn/deltaconv.py:8-73.

Scalar stream:
  ``x' = maxagg_k(s_mlp_max(x)[nbr]) + s_mlp([x, div v, curl v, |v|])``
  (the first/centralized variant runs ``s_mlp_max`` on ``x_j - x_i``
  per edge before aggregating).
Vector stream (skipped on the last layer):
  ``v' = v_mlp(I_J([v, hodge_laplacian(v), grad x']))``

The PyG ragged scatter-max becomes a dense masked max over the fixed
``[N, K]`` neighbor axis — a plain VPU reduction, no scatter at all.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as lnn
import jax
import jax.numpy as jnp

from ..geometry.grad_div import GradDiv
from ..geometry.operators import I_J, J, curl, norm
from .mlp import MLP, VectorMLP

__all__ = ["DeltaConv", "gather_neighbors"]


def gather_neighbors(x, nbr_idx):
    """Gather per-neighbor features: ``x[..., N, C], idx[..., N, K] ->
    [..., N, K, C]`` with any number of leading batch axes."""
    if nbr_idx.ndim == 2:
        return x[nbr_idx]
    return jax.vmap(gather_neighbors)(x, nbr_idx)


@jax.custom_vjp
def _masked_max(h, mask):
    """Max over axis -2 with single-winner gradient routing.

    Forward is a plain VPU reduce. The backward scatters each output
    cotangent to exactly ONE winning slot via an elementwise iota ==
    argmax compare (torch-scatter semantics) — never a gather/scatter
    op, and deterministic under any SPMD partitioning (XLA's eq-based
    reduce_max transpose splits across near-ties and is sensitive to
    reduction order).
    """
    neg = jnp.asarray(-jnp.inf, h.dtype)
    return jnp.max(jnp.where(mask, h, neg), axis=-2)


def _masked_max_fwd(h, mask):
    neg = jnp.asarray(-jnp.inf, h.dtype)
    masked = jnp.where(mask, h, neg)
    winner = jnp.argmax(masked, axis=-2).astype(jnp.int32)  # [..., C]
    return jnp.max(masked, axis=-2), (winner, h.shape[-2])


def _masked_max_bwd(res, g):
    winner, k = res
    k_iota = jnp.arange(k, dtype=jnp.int32).reshape(
        (1,) * (winner.ndim - 1) + (k, 1)
    )
    dh = jnp.where(k_iota == winner[..., None, :], g[..., None, :], 0.0)
    return dh.astype(g.dtype), None


_masked_max.defvjp(_masked_max_fwd, _masked_max_bwd)


def _aggregate(h, nbr_mask, aggr: str):
    """Masked aggregation over the neighbor axis: [..., K, C] -> [..., C]."""
    mask = nbr_mask[..., None]
    if aggr == "max":
        out = _masked_max(h, mask)
        # Rows with no valid neighbor (padded points) -> 0, not -inf.
        return jnp.where(jnp.any(nbr_mask, axis=-1)[..., None], out, 0.0)
    if aggr == "mean":
        m = mask.astype(h.dtype)
        cnt = jnp.maximum(jnp.sum(m, axis=-2), 1.0)
        return jnp.sum(h * m, axis=-2) / cnt
    if aggr == "sum" or aggr == "add":
        return jnp.sum(h * mask.astype(h.dtype), axis=-2)
    raise ValueError(f"unknown aggregation '{aggr}'")


class DeltaConv(lnn.Module):
    """One DeltaConv block.

    Attributes:
      out_channels: output width of both streams.
      depth: number of layers in each internal MLP.
      centralized: centralize scalar features before max aggregation
        (used for the first conv operating on raw positions).
      vector: propagate the vector stream (False on the last layer).
      aggr: scalar-stream aggregation ('max', 'mean', 'sum').
    """

    out_channels: int
    depth: int = 1
    centralized: bool = False
    vector: bool = True
    aggr: str = "max"

    @lnn.compact
    def __call__(self, x, v, gd: GradDiv, train: bool = False,
                 point_mask=None):
        """Args: ``x [..., N, C]``, ``v [..., N, 2, C]``, ``gd`` the
        (optionally batched) operators, ``point_mask`` optional
        ``[..., N]`` validity (excluded from BatchNorm statistics).
        Returns ``(x', v')``."""
        channels = [self.out_channels] * self.depth
        edge_mask = gd.nbr_mask if point_mask is not None else None

        # Scalar -> scalar aggregation branch.
        if self.centralized:
            x_j = gather_neighbors(x, gd.nbr_idx)  # [..., N, K, C]
            edge = x_j - x[..., :, None, :]
            h = MLP(channels, name="s_mlp_max")(edge, train=train,
                                                mask=edge_mask)
            x_max = _aggregate(h, gd.nbr_mask, self.aggr)
        else:
            h = MLP(channels, name="s_mlp_max")(x, train=train,
                                                mask=point_mask)
            if self.aggr == "max":
                # Fused Pallas gather+max on TPU (ops/gather_max.py);
                # reference XLA path elsewhere.
                from ..ops.gather_max import masked_nbr_max

                x_max = masked_nbr_max(h, gd.nbr_idx, gd.nbr_mask)
            else:
                h = gather_neighbors(h, gd.nbr_idx)
                x_max = _aggregate(h, gd.nbr_mask, self.aggr)

        # Operator branch: scalar and vector calculus features.
        # All operator applications are fused into wide matmuls:
        # div([v, Jv]) yields div(v) and -curl(v) in ONE apply (the
        # reference recomputes them as separate sparse matvecs,
        # deltaconv.py:57,66 + operators.py:35-46), and
        # grad([div_v, curl_v]) yields both Hodge-Laplacian terms in
        # one — narrow-column batched matmuls waste the MXU.
        c = x.shape[-1]
        dd = gd.div(jnp.concatenate([v, J(v)], axis=-1))  # [..., 2C]
        div_v = dd[..., :c]
        curl_v = -dd[..., c:]
        x_cat = jnp.concatenate([x, div_v, curl_v, norm(v)], axis=-1)
        x = x_max + MLP(channels, name="s_mlp")(x_cat, train=train,
                                                mask=point_mask)

        # Vector stream. Both Hodge-Laplacian terms AND grad(x') come
        # from the SAME grad operator, so all three ride ONE 3C-wide
        # apply (one read of the dense W_grad instead of two).
        if self.vector:
            gg = gd.grad(jnp.concatenate([div_v, curl_v, x], axis=-1))
            hodge = -(gg[..., :c] + J(gg[..., c:2 * c]))
            v_cat = jnp.concatenate([v, hodge, gg[..., 2 * c:]], axis=-1)
            v = VectorMLP(channels, name="v_mlp")(I_J(v_cat), train=train,
                                                  mask=point_mask)

        return x, v
