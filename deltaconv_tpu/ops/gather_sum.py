"""Fused masked neighbor-gather + sum (Pallas).

``gather_sum(h, idx, mask)``: ``[B, N, C], [B, N, K], [B, N, K] ->
[B, N, C]`` with ``out[b, n] = sum over valid k of h[b, idx[b, n, k]]``.

Unlike :mod:`.gather_max` (which needs every per-k value to compare),
the sum collapses the K one-hots into ONE adjacency-count row per
point BEFORE the matmul: ``A[t, m] = #{k valid : idx[t, k] == m}``,
so the MXU pass is ``[T, 2N] @ [2N, C]`` — K times fewer FLOPs than
the per-k one-hot. Counts <= K are exact in bf16; the feature table is
hi/lo split on the contraction axis for an exact f32 result.

Used by the centralized DeltaConv fast path to compute train-mode
BatchNorm statistics over edge populations without materializing the
``[B, N, K, C]`` edge tensor (see nn/deltaconv.py).

The VJP w.r.t. ``h`` is the transposed adjacency matmul (a second
Pallas kernel accumulating over point tiles).

At headline sizes (``B * N * N * 2 <= _DENSE_ADJ_MAX_BYTES``, see
``_dense_path_ok``) the adjacency counts are MATERIALIZED once as a
``[B, N, N]`` bf16 matrix instead: the per-k select-accumulate — not
the MXU product — dominates the streaming kernels, and one build
serves both the forward matmul and the transposed VJP matmul (no
backward rebuild). Larger batch*cloud products keep the streaming
kernels' O(N*K) memory.

NOTE (ADVICE r4): the PRIMAL (non-differentiated) forward always
streams, while the VJP forward takes the dense-adjacency path at
headline sizes — both are exact f32 contractions, but their summation
ORDER differs, so eval and grad-traced forwards of the same inputs
can differ in the last ulp of f32 reassociation. Deliberate (the
primal never pays the adjacency build); a future bit-parity test
should not chase it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gather_max import split_hilo

__all__ = ["gather_sum"]


def _pad_to(x, multiple, axis):
    pad = (-x.shape[axis]) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _adjacency(idx_ref, mask_ref, t, n, k, twice):
    """[T, 2N (or N)] masked adjacency counts from [1, T, K] blocks.

    Accumulation stays f32: a bf16 select-accumulate here crashes the
    Mosaic compile helper on v5e (like its bf16 vector compares)."""
    cols = 2 * n if twice else n
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (t, cols), 1)
    if twice:
        col_iota = col_iota % n
    acc = jnp.zeros((t, cols), jnp.float32)
    for kk in range(k):
        hit = idx_ref[0, :, kk][:, None] == col_iota
        m = mask_ref[0, :, kk][:, None] > 0
        acc = acc + jnp.where(hit & m, 1.0, 0.0)
    return acc.astype(jnp.bfloat16)


def _fwd_kernel(idx_ref, mask_ref, hilo_ref, out_ref, *, k, n):
    t = idx_ref.shape[1]
    adj = _adjacency(idx_ref, mask_ref, t, n, k, twice=True)
    out_ref[0] = jnp.dot(adj, hilo_ref[0],
                         preferred_element_type=jnp.float32)


def _adj_kernel(idx_ref, mask_ref, out_ref, *, k, n):
    t = idx_ref.shape[1]
    out_ref[0] = _adjacency(idx_ref, mask_ref, t, n, k, twice=False)


# Materialized-adjacency cutoff, keyed on TOTAL bytes (the [B, N, N]
# bf16 matrix is held live as a VJP residual from forward to backward,
# so B matters as much as N: B=16 x N=4096 alone would be ~536 MB).
# The reference's two headline configs sit well under it: B=32/N=1024
# = 64 MB, B=16/N=2048 = 128 MB. Above the budget the streaming
# kernels keep O(N*K) memory.
_DENSE_ADJ_MAX_BYTES = 256 * 1024 * 1024


def _dense_path_ok(b: int, n: int) -> bool:
    return b * n * n * 2 <= _DENSE_ADJ_MAX_BYTES


def _adjacency_matrix(idx, mask, tile, interpret):
    """Masked adjacency counts ``A[b, n, m] = #{k valid: idx[b,n,k]==m}``
    as a materialized ``[B, N, N]`` bf16 matrix (exact: counts <= K).

    The select-accumulate that builds A is the expensive part of the
    streaming kernels (the MXU product is K-fold cheaper); building A
    ONCE and reusing it in the forward AND the VJP runs the per-k
    passes at half the forward kernel's column width and skips the
    backward's rebuild entirely (train-step trace: 1.91 -> ~0.9 ms on
    the centralized conv's edge statistics)."""
    b, n = idx.shape[0], idx.shape[1]
    k = idx.shape[-1]
    idx_p = _pad_to(idx.astype(jnp.int32), tile, 1)
    mask_p = _pad_to(mask.astype(jnp.int32), tile, 1)
    n_pad = idx_p.shape[1]
    adj = pl.pallas_call(
        functools.partial(_adj_kernel, k=k, n=n),
        grid=(b, n_pad // tile),
        in_specs=[
            pl.BlockSpec((1, tile, k), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, k), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, n), lambda ib, it: (ib, it, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, n), jnp.bfloat16),
        interpret=interpret,
    )(idx_p, mask_p)
    return adj[:, :n]


def _bwd_kernel(idx_ref, mask_ref, g_ref, dh_ref, *, k, n):
    t = idx_ref.shape[1]
    adj = _adjacency(idx_ref, mask_ref, t, n, k, twice=False)  # [T, N]
    # Cotangent arrives PRE-SPLIT hi/lo ([T, 2C] bf16, barrier-built
    # in _gather_sum_bwd): splitting in-kernel is unsafe — the
    # compiler (XLA under interpret, and newer lowering pipelines)
    # cancels g - f32(bf16(g)) to zero, silently degrading the
    # backward to single-bf16 (caught by the TPU gradient tests).
    g = g_ref[0]  # [T, 2C] bf16
    c2 = g.shape[-1]
    both = jnp.dot(adj.T, g, preferred_element_type=jnp.float32)
    acc = both[:, :c2 // 2] + both[:, c2 // 2:]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dh_ref[0] = jnp.zeros_like(dh_ref[0])

    dh_ref[0] += acc


def _reference(h, idx, mask):
    gathered = jax.vmap(lambda a, i: a[i])(h, idx)  # [B, N, K, C]
    m = mask[..., None].astype(h.dtype)
    return jnp.sum(gathered * m, axis=-2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gather_sum(h, idx, mask, tile=128, interpret=False):
    """Masked neighbor sum ``[B, N, C] -> [B, N, C]`` (see module
    docstring); differentiable in ``h``."""
    return _fwd(h, idx, mask, tile, interpret)


def _fwd(h, idx, mask, tile, interpret):
    # Primal-only (non-differentiated) call: keep the streaming kernel
    # — the dense path's only payoff is reusing A in the VJP; with no
    # VJP the [B, N, N] materialization is a pure HBM round trip.
    out, _ = _fwd_with_adj(h, idx, mask, tile, interpret,
                           need_adj=False)
    return out


def _fwd_with_adj(h, idx, mask, tile, interpret, need_adj=True):
    """Returns ``(out, A_or_None)`` — A is the materialized adjacency
    when the dense fast path engaged (reused by the VJP). Pass
    ``need_adj=False`` for forward-only callers: the streaming kernel
    keeps the adjacency in VMEM per tile instead of writing B*N^2
    bytes to HBM that nothing will reuse."""
    if jax.default_backend() != "tpu" and not interpret:
        return _reference(h, idx, mask).astype(jnp.float32), None
    b, n, c = h.shape
    k = idx.shape[-1]
    if need_adj and _dense_path_ok(b, n):
        adj = _adjacency_matrix(idx, mask, tile, interpret)
        # hi/lo channel-stack: exact f32 sum through bf16 MXU operands
        # (adjacency counts and the split halves are bf16-exact).
        hilo, _ = split_hilo(h.astype(jnp.float32))  # [B, N, 2C]
        out2 = jnp.einsum("bnm,bmc->bnc", adj, hilo,
                          preferred_element_type=jnp.float32)
        return out2[..., :c] + out2[..., c:], adj
    idx_p = _pad_to(idx.astype(jnp.int32), tile, 1)
    mask_p = _pad_to(mask.astype(jnp.int32), tile, 1)
    n_pad = idx_p.shape[1]

    # hf is f32 by construction, so split_hilo always row-stacks.
    hilo, _ = split_hilo(h.astype(jnp.float32), axis=1)  # [B, 2N, C]

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, k=k, n=n),
        grid=(b, n_pad // tile),
        in_specs=[
            pl.BlockSpec((1, tile, k), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, k), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * n, c), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda ib, it: (ib, it, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c), jnp.float32),
        interpret=interpret,
    )(idx_p, mask_p, hilo)
    return out[:, :n], None


def _gather_sum_fwd(h, idx, mask, tile, interpret):
    out, adj = _fwd_with_adj(h, idx, mask, tile, interpret)
    return out, (idx, mask, adj, h.shape, jnp.zeros((0,), h.dtype))


def _gather_sum_bwd(tile, interpret, res, g):
    idx, mask, adj, hshape, dtype_carrier = res
    b, n, c = hshape
    k = idx.shape[-1]
    g = g.astype(jnp.float32)
    if adj is not None:
        # Transposed adjacency matmul on the SAME materialized A the
        # forward built; exact f32 cotangent routing via the hi/lo
        # channel-stack (split_hilo owns the barrier idiom).
        ghilo, _ = split_hilo(g)  # [B, N, 2C] bf16
        both = jnp.einsum("bnm,bnc->bmc", adj, ghilo,
                          preferred_element_type=jnp.float32)
        dh = both[..., :c] + both[..., c:]
        return dh.astype(dtype_carrier.dtype), None, None
    if jax.default_backend() != "tpu" and not interpret:
        bidx = jnp.arange(b)[:, None, None, None]
        cidx = jnp.arange(c)[None, None, None, :]
        dh = jnp.zeros((b, n, c), jnp.float32)
        contrib = g[:, :, None, :] * mask[..., None].astype(jnp.float32)
        dh = dh.at[bidx, idx[..., None], cidx].add(contrib)
        return dh.astype(dtype_carrier.dtype), None, None

    idx_p = _pad_to(idx.astype(jnp.int32), tile, 1)
    mask_p = _pad_to(mask.astype(jnp.int32), tile, 1)
    n_pad = idx_p.shape[1]
    g_p = _pad_to(g, tile, 1)
    # Exact hi/lo cotangent split, built OUTSIDE the kernel behind a
    # barrier (split_hilo owns the idiom; see _bwd_kernel).
    g_hilo, _ = split_hilo(g_p.astype(jnp.float32))  # [B, N_pad, 2C]

    dh = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k, n=n),
        grid=(b, n_pad // tile),
        in_specs=[
            pl.BlockSpec((1, tile, k), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, k), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 2 * c), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda ib, it: (ib, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        interpret=interpret,
    )(idx_p, mask_p, g_hilo)
    return dh.astype(dtype_carrier.dtype), None, None


gather_sum.defvjp(_gather_sum_fwd, _gather_sum_bwd)
