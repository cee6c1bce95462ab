"""Fused centralized edge-MLP for TRAINING (recompute-in-backward).

The depth-2 centralized scalar stream (reference
/root/reference/deltaconv/nn/deltaconv.py:50-54 with ``mlp_depth=2``
from train_shapenet.py:79-89) is the dominant cost of the segmentation
TRAIN step: the reference pipeline materializes a ``[B, N, K, C]``
edge tensor and runs the two-layer MLP over it in both directions —
at the ShapeNet config that is ~250 MB of f32 intermediates per layer
and ~13 ms/step of HBM-bound elementwise on top of the 6.5 ms edge
gather (PERF.md seg-train stage table).

This op computes the FIRST MLP layer per edge inside a Pallas kernel
and materializes only ONE bf16 tensor — the second layer's
pre-normalization activations ``y1``:

  y0 = y[idx_k] - y[i]        (Dense_0 commuted through the edge
                               difference — EdgeMaxMLP's trick: the
                               caller computes y = Dense_0(x) once per
                               POINT, so the gather runs at C0 lanes
                               and W0 never enters the kernel)
  h0 = LeakyReLU(y0 * a0 + b0)  (train-mode BatchNorm_0 as an affine:
                               the caller derives (a0, b0) from edge
                               moments it gets via neighbor SUMS —
                               ops/gather_sum.py — again without any
                               edge tensor)
  y1 = bf16(h0) @ W1           -> [B, N, K, C1] bf16

Everything downstream (BatchNorm_1 edge moments, its affine,
LeakyReLU, the masked neighbor max with the single-winner VJP) is
plain differentiable XLA over the ONE bf16 tensor, so the full
BatchNorm-through-batch-moments gradient comes from autodiff
composition — the custom VJP below only covers the kernel itself and
RECOMPUTES the gather + layer-0 chain in the backward instead of
stashing any edge intermediate:

  dh0  = dY1 @ W1^T ;  dpre = dh0 * LeakyReLU'(pre0) ;  dy0 = dpre*a0
  dy  += onehot^T @ dy0  (transposed one-hot MXU contraction)
  dy[i] -= sum_k dy0     (the centralized self term, direct addressing)
  dW1  = sum_e h0^T dY1 ;  da0 = sum_e dpre*y0 ;  db0 = sum_e dpre

The kNN self slot (slot 0) is the zero edge: its value is the
constant row ``z0 = bf16(LeakyReLU(b0)) @ W1`` computed by the caller
(whose autodiff owns the slot's b0/W1 gradients via the returned
``dz0 = sum dY1[:, :, 0]``).

Precision: gathers and matmuls run bf16 with f32 accumulation,
rounding at the same points as the reference pipeline
(``MLP(dtype="bfloat16")`` layer-by-layer); the backward rounds the
scattered cotangent to bf16 for the transposed one-hot contraction
(the half-width route the other train kernels use — ~2^-9 relative on
that term). The CPU/XLA reference path materializes the edges with
identical rounding, so tests compare tightly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gather_max import _pad_to, _self_rows, build_onehot, fit_tile

__all__ = ["edge_delta_mlp"]


def _fwd_kernel(idx_ref, y_ref, ab_ref, w1_ref, z0_ref, out_ref, *, k,
                n):
    t = idx_ref.shape[1]
    c0 = y_ref.shape[2]
    onehot = build_onehot(idx_ref, t, n, k, k0=1)  # [(K-1)*T, N] bf16
    yg = jnp.dot(onehot, y_ref[0],
                 preferred_element_type=jnp.float32)  # [(K-1)T, C0]
    ys = _self_rows(y_ref, t).astype(jnp.float32)  # [T, C0]
    y0 = (yg.reshape(k - 1, t, c0) - ys[None]).reshape((k - 1) * t, c0)
    a0 = ab_ref[0:1]
    b0 = ab_ref[1:2]
    pre = y0 * a0 + b0
    h = jnp.where(pre >= 0, pre, 0.2 * pre).astype(jnp.bfloat16)
    y1 = jnp.dot(h, w1_ref[...],
                 preferred_element_type=jnp.float32)  # [(K-1)T, C1]
    c1 = y1.shape[-1]
    y1 = y1.reshape(k - 1, t, c1).astype(jnp.bfloat16)
    out_ref[0, :, 0, :] = jnp.broadcast_to(z0_ref[0:1], (t, c1)
                                           ).astype(jnp.bfloat16)
    for kk in range(k - 1):
        out_ref[0, :, kk + 1, :] = y1[kk]


def _bwd_kernel(idx_ref, y_ref, ab_ref, w1_ref, g_ref, dy_ref, dw1_ref,
                dab_ref, *, k, n):
    t = idx_ref.shape[1]
    c0 = y_ref.shape[2]
    kt = (k - 1) * t
    onehot = build_onehot(idx_ref, t, n, k, k0=1)
    yg = jnp.dot(onehot, y_ref[0], preferred_element_type=jnp.float32)
    ys = _self_rows(y_ref, t).astype(jnp.float32)
    y0 = (yg.reshape(k - 1, t, c0) - ys[None]).reshape(kt, c0)
    a0 = ab_ref[0:1]
    b0 = ab_ref[1:2]
    pre = y0 * a0 + b0
    lp = jnp.where(pre >= 0, 1.0, 0.2)
    # h with the forward's exact rounding (bf16 between the layers).
    h = jnp.where(pre >= 0, pre, 0.2 * pre).astype(jnp.bfloat16).astype(
        jnp.float32)

    g = g_ref[0].astype(jnp.float32)  # [T, K, C1]
    c1 = g.shape[-1]
    g1 = jnp.concatenate([g[:, kk + 1, :] for kk in range(k - 1)],
                         axis=0)  # [(K-1)T, C1] k-major like onehot
    # bf16 cotangent into the bf16-weight dot: the exact convention
    # jax.grad of the forward's bf16 matmul uses.
    g1b = g1.astype(jnp.bfloat16)
    dh = jax.lax.dot_general(g1b, w1_ref[...].astype(jnp.bfloat16),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dpre = dh * lp
    dy0 = dpre * a0
    dyj = jax.lax.dot_general(onehot, dy0.astype(jnp.bfloat16),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)

    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(pl.program_id(1) == 0)
    def _init_dy():
        dy_ref[0] = jnp.zeros_like(dy_ref[0])

    @pl.when(first)
    def _init_acc():
        dw1_ref[...] = jnp.zeros_like(dw1_ref[...])
        dab_ref[...] = jnp.zeros_like(dab_ref[...])

    dy_ref[0] += dyj
    t0 = pl.program_id(1) * t
    dself = jnp.sum(dy0.reshape(k - 1, t, c0), axis=0)
    dy_ref[0, pl.ds(t0, t), :] -= dself

    dw1_ref[...] += jax.lax.dot_general(
        h.astype(jnp.bfloat16), g1b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [C0, C1]
    dab_ref[0:1] += jnp.sum(dpre * y0, axis=0, keepdims=True)
    dab_ref[1:2] += jnp.sum(dpre, axis=0, keepdims=True)


def _reference(y, a0, b0, w1, z0, idx):
    """XLA path (CPU backends + test anchor): materializes the edges
    with the kernel's exact rounding points."""
    yg = jax.vmap(lambda a, i: a[i])(y, idx)  # [B, N, K, C0] bf16
    y0 = (yg.astype(jnp.float32)
          - y.astype(jnp.float32)[..., None, :])
    pre = y0 * a0 + b0
    h = jnp.where(pre >= 0, pre, 0.2 * pre).astype(jnp.bfloat16)
    y1 = jnp.dot(h, w1.astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32)
    # Keep the concat in f32 (values already bf16-representable) so
    # autodiff's broadcast-sum cotangent for z0 accumulates in f32;
    # one final cast reproduces the kernel's bf16 output bit-for-bit.
    y1 = y1.astype(jnp.bfloat16).astype(jnp.float32)
    z0r = jnp.broadcast_to(z0.astype(jnp.bfloat16).astype(jnp.float32),
                           y1[..., 0, :].shape)
    out = jnp.concatenate([z0r[..., None, :], y1[..., 1:, :]], axis=-2)
    return out.astype(jnp.bfloat16)


def _pallas_fwd(y, a0, b0, w1, z0, idx, tile, interpret):
    b, n, c0 = y.shape
    k = idx.shape[-1]
    c1 = w1.shape[-1]
    tile = fit_tile(tile, (k - 1) * (2 * n + 20 * c0 + 6 * c1)
                    + k * 2 * c1)
    idx_p = _pad_to(idx.astype(jnp.int32), tile, 1)
    n_pad = idx_p.shape[1]
    y_p = _pad_to(y.astype(jnp.bfloat16), tile, 1)
    ab = jnp.stack([a0, b0]).astype(jnp.float32)  # [2, C0]

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, k=k, n=n_pad),
        grid=(b, n_pad // tile),
        in_specs=[
            pl.BlockSpec((1, tile, k), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, c0), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c0), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c0, c1), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c1), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, k, c1),
                               lambda ib, it: (ib, it, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, k, c1), jnp.bfloat16),
        interpret=interpret,
    )(idx_p, y_p, ab, w1.astype(jnp.bfloat16),
      z0.astype(jnp.float32)[None, :])
    return out[:, :n]


def _pallas_bwd(y, a0, b0, w1, idx, g, tile, interpret):
    b, n, c0 = y.shape
    k = idx.shape[-1]
    c1 = w1.shape[-1]
    tile = fit_tile(tile, (k - 1) * (2 * n + 30 * c0 + 10 * c1)
                    + k * 4 * c1, fixed_bytes=n * 4 * c0)
    idx_p = _pad_to(idx.astype(jnp.int32), tile, 1)
    n_pad = idx_p.shape[1]
    y_p = _pad_to(y.astype(jnp.bfloat16), tile, 1)
    g_p = _pad_to(g.astype(jnp.float32), tile, 1)
    ab = jnp.stack([a0, b0]).astype(jnp.float32)

    dy, dw1, dab = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k, n=n_pad),
        grid=(b, n_pad // tile),
        in_specs=[
            pl.BlockSpec((1, tile, k), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, c0), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c0), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c0, c1), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, k, c1), lambda ib, it: (ib, it, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n_pad, c0), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c0, c1), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c0), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, c0), jnp.float32),
            jax.ShapeDtypeStruct((c0, c1), jnp.float32),
            jax.ShapeDtypeStruct((2, c0), jnp.float32),
        ],
        interpret=interpret,
    )(idx_p, y_p, ab, w1.astype(jnp.float32), g_p)
    return dy[:, :n], dw1, dab


def _reference_bwd(y, a0, b0, w1, idx, g):
    """CPU backward mirroring the kernel's math and rounding (the
    scattered cotangent rounds to bf16 like the one-hot contraction)."""
    b, n, c0 = y.shape
    yg = jax.vmap(lambda a, i: a[i])(y, idx).astype(jnp.float32)
    y0 = yg - y.astype(jnp.float32)[..., None, :]  # [B, N, K, C0]
    pre = y0 * a0 + b0
    lp = jnp.where(pre >= 0, 1.0, 0.2)
    h = jnp.where(pre >= 0, pre, 0.2 * pre).astype(jnp.bfloat16).astype(
        jnp.float32)
    gf = g.astype(jnp.float32)
    g1 = gf.at[..., 0, :].set(0.0)  # slot 0 belongs to z0
    g1b = g1.astype(jnp.bfloat16)
    dh = jnp.dot(g1b, w1.astype(jnp.bfloat16).T,
                 preferred_element_type=jnp.float32)
    dpre = dh * lp
    dy0f = dpre * a0
    dy0 = dy0f.astype(jnp.bfloat16).astype(jnp.float32)
    dy = jnp.zeros((b, n, c0), jnp.float32)
    bidx = jnp.arange(b)[:, None, None, None]
    cidx = jnp.arange(c0)[None, None, None, :]
    dy = dy.at[bidx, idx[..., None], cidx].add(dy0)
    # The kernel's self term subtracts the UNROUNDED f32 sums.
    dy = dy - jnp.sum(dy0f, axis=-2)
    dw1 = jnp.einsum("bnkc,bnkd->cd",
                     h.astype(jnp.bfloat16).astype(jnp.float32),
                     g1b.astype(jnp.float32))
    da0 = jnp.sum(dpre * y0, axis=(0, 1, 2))
    db0 = jnp.sum(dpre, axis=(0, 1, 2))
    dz0 = jnp.sum(gf[..., 0, :], axis=(0, 1))
    return dy, da0, db0, dw1, dz0


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def edge_delta_mlp(y, a0, b0, w1, z0, idx, tile=128, interpret=False):
    """``y [B, N, C0] (bf16), idx [B, N, K] -> y1 [B, N, K, C1] bf16``
    per-edge ``bf16(LeakyReLU((y_j - y_i) * a0 + b0)) @ W1`` with the
    kNN self slot (slot 0, the zero edge) set to the caller-computed
    constant row ``z0``. Differentiable in everything but ``idx``;
    the backward recomputes the gather + layer-0 chain per tile (see
    module docstring) instead of stashing any edge tensor."""
    return _fwd_dispatch(y, a0, b0, w1, z0, idx, tile, interpret)


def _fwd_dispatch(y, a0, b0, w1, z0, idx, tile, interpret):
    if jax.default_backend() == "tpu" or interpret:
        return _pallas_fwd(y, a0, b0, w1, z0, idx, tile, interpret)
    return _reference(y.astype(jnp.bfloat16), a0, b0, w1, z0, idx)


def _edge_fwd(y, a0, b0, w1, z0, idx, tile, interpret):
    out = _fwd_dispatch(y, a0, b0, w1, z0, idx, tile, interpret)
    return out, (y, a0, b0, w1, idx)


def _edge_bwd(tile, interpret, res, g):
    y, a0, b0, w1, idx = res
    if jax.default_backend() == "tpu" or interpret:
        dy, dw1, dab = _pallas_bwd(y, a0, b0, w1, idx, g, tile,
                                   interpret)
        dz0 = jnp.sum(g.astype(jnp.float32)[..., 0, :], axis=(0, 1))
        da0, db0 = dab[0], dab[1]
    else:
        dy, da0, db0, dw1, dz0 = _reference_bwd(y, a0, b0, w1, idx, g)
    return (dy.astype(y.dtype), da0, db0, dw1.astype(w1.dtype), dz0,
            None)


edge_delta_mlp.defvjp(_edge_fwd, _edge_bwd)
