"""Dense (MXU) form of the grad/div operators.

XLA's gather on TPU runs ~40x below HBM bandwidth, so applying the
per-edge coefficient operators via gather+einsum leaves the MXU idle.
For the cloud sizes this framework targets (N <= a few thousand) the
sparse operators fit comfortably as dense per-cloud matrices:

  W_grad [B, 2N, N] : rows (d, n) d-major — grad x = W_grad @ x
  W_div  [B, N, 2N] : cols (d, m) d-major — div v  = W_div @ vec(v)

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

__all__ = ["DenseGradDiv", "densify"]


@flax.struct.dataclass
class DenseGradDiv:
    """Dense grad/div operators plus the neighbor lists (for the
    scalar-stream max aggregation, which stays a gather).

    Drop-in for :class:`GradDiv` in the conv stack: same ``grad``,
    ``div``, ``nbr_idx``, ``nbr_mask`` surface.
    """

    nbr_idx: jnp.ndarray  # [..., N, K] int32
    nbr_mask: jnp.ndarray  # [..., N, K] bool
    w_grad: jnp.ndarray  # [..., 2N, N]
    w_div: jnp.ndarray  # [..., N, 2N]

    def grad(self, x):
        """``[..., N, C] -> [..., N, 2, C]`` via one batched matmul."""
        n = x.shape[-2]
        out = jnp.einsum(
            "...zm,...mc->...zc", self.w_grad, x.astype(self.w_grad.dtype),
            preferred_element_type=jnp.float32,
        )  # [..., 2N, C] rows d-major
        out = out.reshape(*out.shape[:-2], 2, n, out.shape[-1])
        return jnp.swapaxes(out, -3, -2).astype(x.dtype)  # [..., N, 2, C]

    def div(self, v):
        """``[..., N, 2, C] -> [..., N, C]`` via one batched matmul."""
        n = v.shape[-3]
        vz = jnp.swapaxes(v, -3, -2)  # [..., 2, N, C] d-major rows
        vz = vz.reshape(*vz.shape[:-3], 2 * n, vz.shape[-1])
        out = jnp.einsum(
            "...nz,...zc->...nc", self.w_div, vz.astype(self.w_div.dtype),
            preferred_element_type=jnp.float32,
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
    return jnp.einsum(
        "...nkd,...nkm->...dnm", coef.astype(dtype), onehot,
        preferred_element_type=jnp.float32,
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

    # Pallas assembly (ops/densify_op.py) builds rows in VMEM instead
    # of the XLA einsum's [B, N, K, N] one-hot in HBM. Measured on
    # v5e: the einsum fuses better inside the full forward at small N
    # (~1513 vs ~1476 clouds/s at N=1024), the kernel wins once the
    # one-hot traffic dominates (4.8 vs 5.7 ms at N=2048) — so the
    # kernel is the large-N path.
    use_pallas = ((jax.default_backend() == "tpu" and n >= 2048)
                  or interpret)
    if use_pallas and len(lead) <= 1:
        from ..ops.densify_op import densify_coefs

        unbatched = not lead
        idx = gd.nbr_idx[None] if unbatched else gd.nbr_idx
        gc = gd.grad_coef[None] if unbatched else gd.grad_coef
        dc = gd.div_coef[None] if unbatched else gd.div_coef
        wg, wd = densify_coefs(idx, gc, dc, jnp.dtype(dtype).name,
                               128 if n <= 2048 else 64, interpret)
        b = wg.shape[0]
        w_grad = wg.reshape(b, 2 * n, n)
        w_div = wd.reshape(b, n, 2 * n)
        if unbatched:
            w_grad, w_div = w_grad[0], w_div[0]
        return DenseGradDiv(nbr_idx=gd.nbr_idx, nbr_mask=gd.nbr_mask,
                            w_grad=w_grad, w_div=w_div)

    wg = _dense_from_coef(gd.nbr_idx, gd.grad_coef, n, dtype)
    w_grad = wg.reshape(*lead, 2 * n, n).astype(dtype)

    wd = _dense_from_coef(gd.nbr_idx, gd.div_coef, n, dtype)
    # div rows are points, cols are (d, m) d-major.
    w_div = jnp.swapaxes(wd, -3, -2).reshape(*lead, n, 2 * n).astype(dtype)

    return DenseGradDiv(
        nbr_idx=gd.nbr_idx,
        nbr_mask=gd.nbr_mask,
        w_grad=w_grad,
        w_div=w_div,
    )
