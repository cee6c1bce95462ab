"""k-nearest-neighbor search with static shapes, built for the MXU.

Replaces the reference's PyG ``knn_graph(pos, k, loop=True,
flow='target_to_source')`` ragged edge lists
(/root/reference/deltaconv/models/deltanet_base.py:52) with dense
``[N, K]`` neighbor index arrays: point ``i``'s neighbors are
``nbr_idx[i, :]`` with itself always in slot 0 (the C++ preprocessing
uses the same self-first convention, cpp/sampling.cpp:13).

The pairwise-distance matrix is computed as one ``[N, 3] @ [3, N]``
matmul plus rank-1 terms — an MXU-friendly dense formulation — followed
by ``lax.top_k`` per row. For clouds up to ~16k points this is faster
on TPU than any tree-based method; larger clouds should use the tiled
variant (``knn_tiled``) that never materializes the full ``[N, N]``
matrix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["knn", "knn_tiled"]

_BIG = 1e30


@functools.partial(jax.jit, static_argnames=("k", "method"))
def knn(pos, k: int, point_mask=None, method: str = "exact"):
    """Brute-force kNN over one point cloud.

    Args:
      pos: ``[N, 3]`` positions.
      k: number of neighbors, **including** the self-loop which is
        always returned in slot 0 (PyG ``loop=True`` semantics).
      point_mask: optional ``[N]`` bool validity mask; invalid points
        are never returned as neighbors.
      method: ``"exact"`` (lax.top_k) or ``"approx"``
        (``lax.approx_max_k``, the TPU-optimized partial reduction —
        ~2x faster at >0.99 measured recall; training quality is
        insensitive to occasional k-th-neighbor swaps).

    Returns:
      ``(nbr_idx, nbr_mask)``: ``[N, K]`` int32 indices and ``[N, K]``
      bool mask (False on padded slots when fewer than ``k`` valid
      points exist).
    """
    n = pos.shape[0]
    sq = jnp.sum(pos * pos, axis=-1)

    if point_mask is None and n >= k:
        if method == "approx" and jax.default_backend() == "tpu":
            # Fused Pallas scores+top-k (ops/knn_topk.py) with
            # packed-key sweeps: nothing round-trips HBM, ordering is
            # exact at bf16 score granularity (recall ~0.999 vs
            # approx_max_k's 0.95 target).
            from ..ops.knn_topk import knn_topk

            idx = knn_topk(pos[None], k, quantized=True)[0]
            return idx, jnp.ones(idx.shape, bool)

        # Fast path: per-row top-k order is invariant to row-constant
        # shifts, so drop the |xi|^2 term, keep the similarity POSITIVE
        # (score = 2 xi.xj - |xj|^2 = |xi|^2 - d^2), and fold the
        # self-loop pin into the same elementwise epilogue — ONE
        # [N, N] materialization instead of four (negate/eye/mask
        # passes are all HBM-bound at this size; measured 5.5 -> 3.4ms
        # at B=32 N=1024 on v5e).
        s = 2.0 * jnp.dot(
            pos, pos.T, preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        ) - sq[None, :]
        r = jnp.arange(n)
        s = s + jnp.where(r[:, None] == r[None, :], 2.0 * _BIG, 0.0)
        if method == "approx":
            _, idx = lax.approx_max_k(s, k, recall_target=0.95)
        else:
            _, idx = lax.top_k(s, k)
        return idx.astype(jnp.int32), jnp.ones(idx.shape, bool)

    # ||xi - xj||^2 = |xi|^2 + |xj|^2 - 2 xi.xj ; the cross term is a matmul.
    # HIGHEST precision: neighbor *ordering* must not be perturbed by the
    # MXU's default bf16 passes.
    d2 = sq[:, None] + sq[None, :] - 2.0 * jnp.dot(
        pos, pos.T, preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    if point_mask is not None:
        valid = point_mask.astype(bool)
        d2 = jnp.where(valid[None, :], d2, _BIG)
    # Pin the self-loop to the top of every row regardless of duplicates.
    d2 = d2 - 2.0 * _BIG * jnp.eye(n, dtype=d2.dtype)

    if method == "approx":
        neg_d, idx = lax.approx_max_k(-d2, k, recall_target=0.95)
    else:
        neg_d, idx = lax.top_k(-d2, k)
    nbr_mask = neg_d > -_BIG / 2
    # Clamp padded slots to self so downstream gathers stay in-bounds.
    self_idx = jnp.arange(n, dtype=idx.dtype)[:, None]
    idx = jnp.where(nbr_mask, idx, self_idx)
    return idx.astype(jnp.int32), nbr_mask


@functools.partial(jax.jit, static_argnames=("k", "tile"))
def knn_tiled(pos, k: int, tile: int = 2048):
    """Tiled exact kNN for large clouds: O(N * tile) memory.

    Scans query tiles with ``lax.map``-style ``lax.scan`` over row
    blocks, keeping only the running top-k per row. Self-loop in slot 0
    as in :func:`knn`.
    """
    n = pos.shape[0]
    pad = (-n) % tile
    pos_p = jnp.pad(pos, ((0, pad), (0, 0)))
    n_pad = n + pad
    sq_all = jnp.sum(pos_p * pos_p, axis=-1)
    valid_all = jnp.arange(n_pad) < n

    def body(carry, q_start):
        q = lax.dynamic_slice(pos_p, (q_start, 0), (tile, 3))
        q_sq = lax.dynamic_slice(sq_all, (q_start,), (tile,))
        d2 = q_sq[:, None] + sq_all[None, :] - 2.0 * jnp.dot(
            q, pos_p.T, preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
        d2 = jnp.where(valid_all[None, :], d2, _BIG)
        rows = q_start + jnp.arange(tile)
        cols = jnp.arange(n_pad)
        d2 = jnp.where(rows[:, None] == cols[None, :], -_BIG, d2)
        neg_d, idx = lax.top_k(-d2, k)
        return carry, (idx, neg_d)

    _, (idx_t, neg_t) = lax.scan(body, None, jnp.arange(0, n_pad, tile))
    idx = idx_t.reshape(n_pad, k)[:n]
    neg = neg_t.reshape(n_pad, k)[:n]
    nbr_mask = neg > -_BIG / 2
    self_idx = jnp.arange(n, dtype=idx.dtype)[:, None]
    idx = jnp.where(nbr_mask, idx, self_idx)
    return idx.astype(jnp.int32), nbr_mask
