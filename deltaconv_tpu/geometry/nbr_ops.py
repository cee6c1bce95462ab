"""Neighbor-aggregation protocol shared by every operator object.

``DeltaConv`` never gathers through raw indices itself — it asks its
operator object (:class:`~.grad_div.GradDiv`,
:class:`~.dense.DenseGradDiv`, or the point-sharded
``ShardedGradDiv``) for the aggregation it needs. That keeps kernel
dispatch (Pallas vs XLA reference paths) in ONE place and lets the
point-sharded operators swap in collective-based implementations
without touching the conv (reference scatter call sites:
/root/reference/deltaconv/nn/deltaconv.py:50-59).

All methods accept features shaped like ``nbr_idx`` minus the K axis
plus channels — ``[N, C]`` against ``[N, K]`` lists, ``[B, N, C]``
against ``[B, N, K]`` — and normalize batching for the kernels
internally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["NeighborAggregations"]


class NeighborAggregations:
    """Mixin over objects exposing ``nbr_idx``/``nbr_mask``."""

    def _unbatched(self, h):
        return self.nbr_idx.ndim == 2 and h.ndim == 2

    def nbr_max(self, h, self_slot0: bool = True):
        """Masked neighbor max; all-masked rows return 0."""
        from ..ops.gather_max import masked_nbr_max

        return masked_nbr_max(h, self.nbr_idx, self.nbr_mask,
                              self_slot0=self_slot0)

    def nbr_minmax(self, h, self_slot0: bool = True):
        """Masked neighbor (max, min) in one pass; all-masked rows
        return (-3e38, +3e38) — callers mask them."""
        from ..ops.gather_max import gather_minmax

        if self._unbatched(h):
            mx, mn = gather_minmax(h[None], self.nbr_idx[None],
                                   self.nbr_mask[None],
                                   self_slot0=self_slot0)
            return mx[0], mn[0]
        return gather_minmax(h, self.nbr_idx, self.nbr_mask,
                             self_slot0=self_slot0)

    def nbr_matmul_minmax(self, x, w, self_slot0: bool = True):
        """(max, min) of ``(x @ w)[nbr]`` over valid neighbors — the
        eval-mode fused gather-then-matmul fast path (TPU only;
        callers gate on backend)."""
        from ..ops.gather_max import gather_matmul_minmax

        if self._unbatched(x):
            mx, mn = gather_matmul_minmax(x[None], w, self.nbr_idx[None],
                                          self.nbr_mask[None],
                                          self_slot0=self_slot0)
            return mx[0], mn[0]
        return gather_matmul_minmax(x, w, self.nbr_idx, self.nbr_mask,
                                    self_slot0=self_slot0)

    def nbr_matmul_max(self, x, w, self_slot0: bool = True,
                       affine=None):
        """Max of ``(x @ w)[nbr]`` over valid neighbors — single-chain
        variant for sign-folded callers (TPU only; callers gate on
        backend). All-masked rows return -3e38 (callers mask them).
        ``affine = (sign, inv, mean, bias)`` fuses the eval
        BN/LeakyReLU epilogue in-kernel (result is the final
        activation, all-masked rows zeroed)."""
        from ..ops.gather_max import gather_matmul_max

        if self._unbatched(x):
            return gather_matmul_max(x[None], w, self.nbr_idx[None],
                                     self.nbr_mask[None],
                                     self_slot0=self_slot0,
                                     affine=affine)[0]
        return gather_matmul_max(x, w, self.nbr_idx, self.nbr_mask,
                                 self_slot0=self_slot0, affine=affine)

    def nbr_max_affine(self, h, affine, sub_self: bool = False,
                       interpret: bool = False):
        """Forward-only masked neighbor max with the eval BN/LeakyReLU
        epilogue fused in-kernel (TPU/interpret only; callers gate).
        ``sub_self`` subtracts the self row inside the sign fold
        (EdgeMaxMLP's centralized form). Requires the kNN slot-0
        self-loop convention and bf16 features."""
        from ..ops.gather_max import gather_max_affine

        if self._unbatched(h):
            return gather_max_affine(h[None], self.nbr_idx[None],
                                     self.nbr_mask[None], affine,
                                     sub_self=sub_self,
                                     interpret=interpret)[0]
        return gather_max_affine(h, self.nbr_idx, self.nbr_mask, affine,
                                 sub_self=sub_self, interpret=interpret)

    def nbr_matmul_max_train(self, x, w):
        """Differentiable ``max_k (x @ w)[nbr]`` (single-winner VJP,
        gather contraction at C_in lanes — the training twin of
        ``nbr_matmul_max``). All-masked rows return -3e38."""
        from ..ops.gather_max import gather_matmul_max_train

        # The kNN builder pins the self loop to slot 0 (geometry/knn.py)
        # — both the forward and the winner-routed backward read/route
        # it by direct addressing.
        if self._unbatched(x):
            return gather_matmul_max_train(x[None], w, self.nbr_idx[None],
                                           self.nbr_mask[None], True)[0]
        return gather_matmul_max_train(x, w, self.nbr_idx, self.nbr_mask,
                                       True)

    def nbr_sum(self, h, mask=None):
        """Masked neighbor sum (adjacency contraction)."""
        from ..ops.gather_sum import gather_sum

        mask = self.nbr_mask if mask is None else mask
        if self._unbatched(h):
            return gather_sum(h[None], self.nbr_idx[None], mask[None])[0]
        return gather_sum(h, self.nbr_idx, mask)

    def gather(self, h):
        """Plain per-neighbor gather ``[..., N, C] -> [..., N, K, C]``."""

        def one(x, i):
            return x[i]

        f = one
        for _ in range(self.nbr_idx.ndim - 2):
            f = jax.vmap(f)
        return f(h, self.nbr_idx)

    def nbr_gather(self, h):
        """:meth:`gather`, routed through the one-hot MXU gather on
        TPU (``ops/gather_rows``; XLA's native gather runs ~9 GB/s —
        measured 8 ms/step for the segmentation config's [B, N, K, 3]
        edge fetch vs ~2.5 ms for the one-hot contraction) with the
        exact transposed-matmul scatter as its VJP. Off-TPU this is
        ``gather`` itself."""
        if jax.default_backend() != "tpu":
            return self.gather(h)
        from ..ops.gather_rows import gather_rows

        unbatched = self._unbatched(h)
        hb = h[None] if unbatched else h
        idx = self.nbr_idx[None] if unbatched else self.nbr_idx
        out = gather_rows(hb, idx)  # [B, C, K, N] f32 (exact)
        out = jnp.transpose(out, (0, 3, 2, 1)).astype(h.dtype)
        return out[0] if unbatched else out
