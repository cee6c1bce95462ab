"""Dense (MXU) form of the grad/div operators.

XLA's gather on TPU runs ~40x below HBM bandwidth, so applying the
per-edge coefficient operators via gather+einsum leaves the MXU idle.
For the cloud sizes this framework targets (N <= a few thousand) the
sparse operators fit comfortably as dense per-cloud matrices:

  W_grad [B, 2, N, N] : plane d maps scalars to the d-component
  W_div  [B, 2, N, N] : plane d maps the d-component to scalars

built ONCE per forward from the per-edge coefficients by a one-hot
contraction (fused by XLA; Pallas build kernel is a later perf layer),
after which every operator application in the conv stack is a batched
matmul at MXU speed. Coefficients of masked edges are zero, so the
dense form needs no masking.

The reference stores the same operators as torch_sparse matrices
(grad_div_mls.py:263,275); this is the TPU-native equivalent
representation.
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp

from .grad_div import GradDiv
from .nbr_ops import NeighborAggregations

__all__ = ["DenseGradDiv", "densify"]


@flax.struct.dataclass
class DenseGradDiv(NeighborAggregations):
    """Dense grad/div operators plus the neighbor lists (for the
    scalar-stream max aggregation, which stays a gather).

    Drop-in for :class:`GradDiv` in the conv stack: same ``grad``,
    ``div``, ``nbr_idx``, ``nbr_mask`` surface.
    """

    nbr_idx: jnp.ndarray  # [..., N, K] int32
    nbr_mask: jnp.ndarray  # [..., N, K] bool
    w_grad: jnp.ndarray  # [..., 2, N, N]
    w_div: jnp.ndarray  # [..., 2, N, N]
    # Deferred per-cloud infinity-norm normalization (the fused build
    # keeps W unnormalized): (s*W) @ x == W @ (s*x), so the scale rides
    # on the operator INPUTS instead of a second pass over the 2x128MB
    # dense matrices. None = matrices already normalized.
    scale: jnp.ndarray = None  # [...] (one scalar per cloud) or None
    # int8 serving form (opt-in, densify(dtype="int8")): W ~= W_q * s
    # with the per-cloud dequantization scales below; applies quantize
    # the activations symmetrically per cloud and contract s8 x s8 ->
    # s32 on the MXU. Accuracy-changing (8-bit operators + 8-bit
    # activations); eval/serving only. None on the f32/bf16 paths.
    op_scale_grad: jnp.ndarray = None  # [...] or None
    op_scale_div: jnp.ndarray = None  # [...] or None

    def _scaled(self, x, extra_dims):
        if self.scale is None:
            return x
        s = self.scale.reshape(self.scale.shape + (1,) * extra_dims)
        return (x.astype(jnp.float32) * s).astype(x.dtype)

    @property
    def _int8(self):
        return self.w_grad.dtype == jnp.int8

    def nbr_max(self, h, self_slot0: bool = True):
        """int8 mode: the neighbor max runs in the quantized domain
        (max commutes with the positive per-cloud scale), halving the
        one-hot MXU contraction. Otherwise defers to the shared
        protocol."""
        if self._int8:
            from ..ops.gather_max import gather_max_int8

            if self._unbatched(h):
                return gather_max_int8(h[None], self.nbr_idx[None],
                                       self.nbr_mask[None],
                                       self_slot0=self_slot0)[0]
            return gather_max_int8(h, self.nbr_idx, self.nbr_mask,
                                   self_slot0=self_slot0)
        return super().nbr_max(h, self_slot0=self_slot0)

    def nbr_matmul_max(self, x, w, self_slot0: bool = True,
                       affine=None):
        """int8 mode: gather the quantized inputs with an int8 one-hot
        contraction, apply ``w`` in VMEM, dequantize after the max.
        Callers keep the XLA epilogue on the int8 path (``affine`` is
        only honored by the bf16 kernel)."""
        if self._int8:
            assert affine is None, "int8 path keeps the XLA epilogue"
            from ..ops.gather_max import (
                gather_matmul_max_int8,
                int8_quantize,
            )

            unbatched = self._unbatched(x)
            xb = x[None] if unbatched else x
            idx = self.nbr_idx[None] if unbatched else self.nbr_idx
            mask = self.nbr_mask[None] if unbatched else self.nbr_mask
            xq, s = int8_quantize(xb)
            out = gather_matmul_max_int8(xq, w, idx, mask,
                                         self_slot0=self_slot0)
            out = (out.astype(jnp.float32)
                   * s[..., None, None]).astype(x.dtype)
            return out[0] if unbatched else out
        return super().nbr_matmul_max(x, w, self_slot0=self_slot0,
                                      affine=affine)

    def _quantize_in(self, x):
        """Symmetric per-cloud int8 activation quantization; returns
        ``(x_q int8, ax/127 [...])``. Reduces over the trailing point/
        component/channel axes (everything past the batch lead)."""
        lead = self.op_scale_grad.shape
        red = tuple(range(len(lead), x.ndim))
        ax = jnp.maximum(jnp.max(jnp.abs(x), axis=red), 1e-30)
        axb = ax.reshape(lead + (1,) * len(red))
        xq = jnp.round(x / axb * 127.0).astype(jnp.int8)
        return xq, ax / jnp.float32(127.0)

    def grad(self, x):
        """``[..., N, C] -> [..., N, 2, C]`` via one batched matmul."""
        if self.w_grad.dtype == jnp.int8:
            xf = self._scaled(x, 2).astype(jnp.float32)
            xq, sx = self._quantize_in(xf)
            acc = jnp.einsum("...dnm,...mc->...dnc", self.w_grad, xq,
                             preferred_element_type=jnp.int32)
            s = (self.op_scale_grad * sx).reshape(sx.shape + (1, 1, 1))
            return jnp.swapaxes(acc.astype(jnp.float32) * s,
                                -3, -2).astype(x.dtype)
        out = jnp.einsum(
            "...dnm,...mc->...dnc", self.w_grad,
            self._scaled(x, 2).astype(self.w_grad.dtype),
            preferred_element_type=jnp.float32,
        )  # [..., 2, N, C]
        return jnp.swapaxes(out, -3, -2).astype(x.dtype)  # [..., N, 2, C]

    def div(self, v):
        """``[..., N, 2, C] -> [..., N, C]`` as two component matmuls.

        Summing two ``[N, N] @ [N, C]`` products runs ~2.5x faster than
        the equivalent single ``[N, 2N] @ [2N, C]`` contraction (XLA
        materializes the interleaved transpose of ``v`` for the latter;
        measured 0.39 vs 0.87 ms at B=32, N=1024, C=128 on v5e).
        """
        if self.w_div.dtype == jnp.int8:
            vf = self._scaled(v, 3).astype(jnp.float32)
            vq, sv = self._quantize_in(vf)
            acc = jnp.einsum(
                "...nm,...mc->...nc", self.w_div[..., 0, :, :],
                vq[..., 0, :], preferred_element_type=jnp.int32,
            ) + jnp.einsum(
                "...nm,...mc->...nc", self.w_div[..., 1, :, :],
                vq[..., 1, :], preferred_element_type=jnp.int32,
            )
            s = (self.op_scale_div * sv).reshape(sv.shape + (1, 1))
            return (acc.astype(jnp.float32) * s).astype(v.dtype)
        dt = self.w_div.dtype
        v = self._scaled(v, 3)
        out = jnp.einsum(
            "...nm,...mc->...nc", self.w_div[..., 0, :, :],
            v[..., 0, :].astype(dt), preferred_element_type=jnp.float32,
        ) + jnp.einsum(
            "...nm,...mc->...nc", self.w_div[..., 1, :, :],
            v[..., 1, :].astype(dt), preferred_element_type=jnp.float32,
        )
        return out.astype(v.dtype)


def _dense_from_coef(nbr_idx, coef, n, dtype):
    """One-hot contraction: ``W[d*N+n_row, m] = sum_k coef[n_row, k, d]
    * [nbr_idx[n_row, k] == m]`` -> ``[..., 2, N, N]``.

    The bf16 one-hot never hits HBM at full size — XLA fuses the
    compare into the contraction loop.
    """
    iota = jnp.arange(n, dtype=jnp.int32)
    onehot = (nbr_idx[..., None] == iota).astype(dtype)  # [..., N, K, N]
    # HIGHEST: on TPU the DEFAULT matmul precision truncates f32 inputs
    # to one bf16 MXU pass, which breaks this fallback's exact-f32
    # contract when duplicate neighbor columns nearly cancel (the
    # Pallas kernel accumulates in f32; test_densify_pallas_matches_xla
    # pins agreement). For bf16 inputs HIGHEST is the same single pass.
    return jnp.einsum(
        "...nkd,...nkm->...dnm", coef.astype(dtype), onehot,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def densify(gd: GradDiv, dtype: Optional[jnp.dtype] = None,
            interpret: bool = False) -> DenseGradDiv:
    """Materializes a :class:`GradDiv` into its dense MXU form.

    Args:
      gd: the coefficient-form operators (optionally batched).
      dtype: storage dtype of the dense matrices (default float32;
        pass ``jnp.bfloat16`` on TPU for 2x less matmul traffic —
        accumulation stays f32).
      interpret: run the Pallas assembly kernel in interpret mode
        (CPU testing).
    """
    dtype = dtype or jnp.float32
    n = gd.nbr_idx.shape[-2]
    lead = gd.nbr_idx.shape[:-2]

    if jnp.dtype(dtype) == jnp.int8:
        return _densify_int8(gd, n, lead, interpret)

    # Pallas assembly (ops/densify_op.py) builds rows in VMEM instead
    # of the XLA einsum's [B, N, K, N] one-hot in HBM. Measured on
    # v5e at B=32, N=1024, K=20: the kernel assembles BOTH operators in
    # ~2.7 ms vs ~3.1 ms for ONE einsum, so it is the TPU path for all
    # cloud sizes of interest.
    use_pallas = ((jax.default_backend() == "tpu" and n >= 512)
                  or interpret)
    if use_pallas and len(lead) <= 1:
        from ..ops.densify_op import densify_coefs

        unbatched = not lead
        idx = gd.nbr_idx[None] if unbatched else gd.nbr_idx
        gc = gd.grad_coef[None] if unbatched else gd.grad_coef
        dc = gd.div_coef[None] if unbatched else gd.div_coef
        w_grad, w_div = densify_coefs(idx, gc, dc, jnp.dtype(dtype).name,
                                      128 if n <= 2048 else 64, interpret)
        if unbatched:
            w_grad, w_div = w_grad[0], w_div[0]
        return DenseGradDiv(nbr_idx=gd.nbr_idx, nbr_mask=gd.nbr_mask,
                            w_grad=w_grad, w_div=w_div)

    w_grad = _dense_from_coef(gd.nbr_idx, gd.grad_coef, n, dtype).astype(dtype)
    w_div = _dense_from_coef(gd.nbr_idx, gd.div_coef, n, dtype).astype(dtype)

    return DenseGradDiv(
        nbr_idx=gd.nbr_idx,
        nbr_mask=gd.nbr_mask,
        w_grad=w_grad,
        w_div=w_div,
    )


def _densify_int8(gd: GradDiv, n, lead, interpret):
    """Opt-in quantized serving form (``dtype="int8"``): per-cloud
    symmetric 8-bit operators with dequantization scales riding on the
    applies. Forward-only — eval/serving, not training. Accuracy-
    changing by construction (tests pin the tolerance; see PERF.md)."""
    from ..ops.densify_op import densify_coefs_int8

    unbatched = not lead
    idx = gd.nbr_idx[None] if unbatched else gd.nbr_idx
    gc = gd.grad_coef[None] if unbatched else gd.grad_coef
    dc = gd.div_coef[None] if unbatched else gd.div_coef
    if len(idx.shape[:-2]) != 1:
        raise NotImplementedError(
            "int8 densify supports one batch axis")

    if jax.default_backend() == "tpu" or interpret:
        wg, wd, sg, sd = densify_coefs_int8(idx, gc, dc,
                                            interpret=interpret)
    else:
        # XLA fallback (CPU tests): same quantization, one-hot build.
        from ..ops.densify_op import _quantize_pack

        packed, sg_raw, sd_raw = _quantize_pack(gc, dc)
        sg, sd = sg_raw / 127.0, sd_raw / 127.0

        def byte(shift):
            vals = ((packed << (24 - shift)) >> 24).astype(jnp.float32)
            iota = jnp.arange(n, dtype=jnp.int32)
            onehot = (idx[..., None] == iota).astype(jnp.float32)
            return jnp.einsum("...nk,...nkm->...nm", vals, onehot)

        wg = jnp.stack([byte(0), byte(8)], axis=-3).astype(jnp.int8)
        wd = jnp.stack([byte(16), byte(24)], axis=-3).astype(jnp.int8)
    if unbatched:
        wg, wd, sg, sd = wg[0], wd[0], sg[0], sd[0]
    return DenseGradDiv(nbr_idx=gd.nbr_idx, nbr_mask=gd.nbr_mask,
                        w_grad=wg, w_div=wd,
                        op_scale_grad=sg, op_scale_div=sd)
