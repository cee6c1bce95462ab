"""Fused centralized edge-MLP for TRAINING (stash-one-tensor VJP).

The depth-2 centralized scalar stream (reference
/root/reference/deltaconv/nn/deltaconv.py:50-54 with ``mlp_depth=2``
from train_shapenet.py:79-89) is the dominant cost of the segmentation
TRAIN step: the reference pipeline materializes a ``[B, N, K, C]``
edge tensor and runs the two-layer MLP over it in both directions —
at the ShapeNet config that is ~250 MB of f32 intermediates per layer
and the largest share of the step's HBM-bound elementwise (PERF.md
seg-train stage table).

This op computes the FIRST MLP layer per edge inside a Pallas kernel:

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
  y1 = bf16(h0) @ W1           -> [B, K, N, C1] bf16 (K-MAJOR: the
                               layout every kernel store/load wants;
                               k-strided [.., N, K, C] blocks are an
                               unsupported Mosaic shape cast)

Everything downstream (BatchNorm_1 edge moments, its affine,
LeakyReLU, the masked neighbor max with the single-winner VJP) is
plain differentiable XLA over the ONE bf16 tensor, so the full
BatchNorm-through-batch-moments gradient comes from autodiff
composition. The custom VJP stashes the f32 edge values ``y0`` (one
extra kernel output — an HBM write, NOT more passes) so the backward
pays NO gather: only the transposed one-hot scatter plus small
matmuls:

  dh0  = dY1 @ W1^T ;  dpre = dh0 * LeakyReLU'(pre0) ;  dy0 = dpre*a0
  dy  += onehot^T @ dy0  (transposed one-hot MXU contraction)
  dy[i] -= sum_k dy0     (the centralized self term, direct addressing)
  dW1  = sum_e h0^T dY1 ;  da0 = sum_e dpre*y0 ;  db0 = sum_e dpre

The kNN self slot (slot 0) is the zero edge: its value is the
constant row ``z0 = bf16(LeakyReLU(b0)) @ W1`` computed by the caller
(whose autodiff owns the slot's b0/W1 gradients via the returned
``dz0 = sum dY1[:, 0]``).

Precision: gathers and matmuls run bf16 with f32 accumulation,
rounding at the same points as the reference pipeline
(``MLP(dtype="bfloat16")`` layer-by-layer); the backward rounds the
cotangent to bf16 wherever jax.grad of the forward's bf16 matmuls
would (pinned against autodiff in the tests), and the scattered
cotangent rounds to bf16 for the transposed one-hot contraction (the
half-width route the other train kernels use — ~2^-9 relative on that
term).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gather_max import _pad_to, _self_rows, build_onehot, fit_tile

__all__ = ["edge_delta_mlp"]

# Both kernels hold a [(K-1)*T, N] bf16 one-hot plus a handful of
# [(K-1)*T, C] f32 temporaries; T=128 runs ~25 MB of Mosaic stack at
# the seg shape — raise the scoped limit (128 MB physical) instead of
# halving the tile (grid overhead measured worse on the bucketed kNN).
_VMEM_BUDGET = 30 * 2 ** 20
_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=56 * 1024 * 1024)


def _fwd_kernel(idx_ref, y_ref, ab_ref, w1_ref, z0_ref, out_ref,
                y0_ref, *, k, n):
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
    out_ref[0, 0] = jnp.broadcast_to(z0_ref[0:1], (t, c1)
                                     ).astype(jnp.bfloat16)
    y0r = y0.reshape(k - 1, t, c0)
    for kk in range(k - 1):
        out_ref[0, kk + 1] = y1[kk]
        y0_ref[0, kk] = y0r[kk]


def _bwd_kernel(idx_ref, y0_ref, ab_ref, w1_ref, g_ref, dy_ref,
                dw1_ref, dab_ref, *, k, n):
    """Backward WITHOUT a gather: the forward's stashed f32 ``y0``
    block replaces the one-hot gather recompute (traced at ~2.5 ms of
    the 6.3 ms recompute-in-backward variant); the one-hot is built
    only for the transposed scatter contraction."""
    t = idx_ref.shape[1]
    c0 = y0_ref.shape[3]
    kt = (k - 1) * t
    y0 = y0_ref[0].reshape(kt, c0)  # [(K-1)T, C0] f32
    a0 = ab_ref[0:1]
    b0 = ab_ref[1:2]
    pre = y0 * a0 + b0
    lp = jnp.where(pre >= 0, 1.0, 0.2)
    # h with the forward's exact rounding (bf16 between the layers).
    h = jnp.where(pre >= 0, pre, 0.2 * pre).astype(jnp.bfloat16)

    g = g_ref[0]  # [K, T, C1] bf16 (k-major blocks)
    c1 = g.shape[-1]
    g1b = g[1:].reshape(kt, c1)  # [(K-1)T, C1] k-major like onehot
    # bf16 cotangent into the bf16-weight dot: the exact convention
    # jax.grad of the forward's bf16 matmul uses.
    dh = jax.lax.dot_general(g1b, w1_ref[...].astype(jnp.bfloat16),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dpre = dh * lp
    dy0 = dpre * a0
    onehot = build_onehot(idx_ref, t, n, k, k0=1)
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
        h, g1b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [C0, C1]
    dab_ref[0:1] += jnp.sum(dpre * y0, axis=0, keepdims=True)
    dab_ref[1:2] += jnp.sum(dpre, axis=0, keepdims=True)


def _reference(y, a0, b0, w1, z0, idx):
    """XLA path (CPU backends + test anchor): materializes the edges
    with the kernel's exact rounding points; K-MAJOR output like the
    kernel."""
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
    return jnp.moveaxis(out.astype(jnp.bfloat16), -2, -3)


def _pallas_fwd(y, a0, b0, w1, z0, idx, tile, interpret):
    b, n, c0 = y.shape
    k = idx.shape[-1]
    c1 = w1.shape[-1]
    tile = fit_tile(tile, (k - 1) * (2 * n + 24 * c0 + 6 * c1)
                    + k * 2 * c1, budget=_VMEM_BUDGET)
    idx_p = _pad_to(idx.astype(jnp.int32), tile, 1)
    n_pad = idx_p.shape[1]
    y_p = _pad_to(y.astype(jnp.bfloat16), tile, 1)
    ab = jnp.stack([a0, b0]).astype(jnp.float32)  # [2, C0]

    out, y0 = pl.pallas_call(
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
        out_specs=[
            pl.BlockSpec((1, k, tile, c1), lambda ib, it: (ib, 0, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k - 1, tile, c0),
                         lambda ib, it: (ib, 0, it, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k, n_pad, c1), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, k - 1, n_pad, c0), jnp.float32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(idx_p, y_p, ab, w1.astype(jnp.bfloat16),
      z0.astype(jnp.float32)[None, :])
    return out[:, :, :n], y0


def _pallas_bwd(y0, a0, b0, w1, idx, g, n, tile, interpret):
    b = idx.shape[0]
    k = idx.shape[-1]
    c0 = y0.shape[-1]
    c1 = w1.shape[-1]
    tile = fit_tile(tile, (k - 1) * (2 * n + 18 * c0 + 6 * c1)
                    + k * 2 * c1, fixed_bytes=n * 4 * c0,
                    budget=_VMEM_BUDGET)
    idx_p = _pad_to(idx.astype(jnp.int32), tile, 1)
    n_pad = idx_p.shape[1]
    # y0 is padded to the FWD's tile multiple; re-pad for a (possibly)
    # different bwd tile.
    y0_p = _pad_to(y0, tile, 2)[:, :, :n_pad]
    # Padded rows carry zero cotangent and contribute nothing to any
    # sum; bf16 halves the 250 MB cotangent materialization and every
    # use is bf16-rounded anyway (see _bwd_kernel).
    g_p = _pad_to(g.astype(jnp.bfloat16), tile, 2)
    ab = jnp.stack([a0, b0]).astype(jnp.float32)

    dy, dw1, dab = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k, n=n_pad),
        grid=(b, n_pad // tile),
        in_specs=[
            pl.BlockSpec((1, tile, k), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k - 1, tile, c0),
                         lambda ib, it: (ib, 0, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c0), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c0, c1), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, tile, c1), lambda ib, it: (ib, 0, it, 0),
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
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(idx_p, y0_p, ab, w1.astype(jnp.float32), g_p)
    return dy[:, :n], dw1, dab


def _reference_bwd(y, a0, b0, w1, idx, g):
    """CPU backward mirroring the kernel's math and rounding; ``g``
    arrives K-MAJOR like the public output."""
    b, n, c0 = y.shape
    yg = jax.vmap(lambda a, i: a[i])(y, idx).astype(jnp.float32)
    y0 = yg - y.astype(jnp.float32)[..., None, :]  # [B, N, K, C0]
    pre = y0 * a0 + b0
    lp = jnp.where(pre >= 0, 1.0, 0.2)
    h = jnp.where(pre >= 0, pre, 0.2 * pre).astype(jnp.bfloat16).astype(
        jnp.float32)
    gf = jnp.moveaxis(g.astype(jnp.float32), -3, -2)  # [B, N, K, C1]
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
    """``y [B, N, C0] (bf16), idx [B, N, K] -> y1 [B, K, N, C1] bf16``
    (K-MAJOR) per-edge ``bf16(LeakyReLU((y_j - y_i) * a0 + b0)) @ W1``
    with the kNN self slot (slot 0, the zero edge) set to the
    caller-computed constant row ``z0``. Differentiable in everything
    but ``idx``; the backward consumes the forward's stashed f32 edge
    values instead of re-gathering (see module docstring)."""
    if jax.default_backend() == "tpu" or interpret:
        out, _ = _pallas_fwd(y, a0, b0, w1, z0, idx, tile, interpret)
        return out
    return _reference(y.astype(jnp.bfloat16), a0, b0, w1, z0, idx)


def _edge_fwd(y, a0, b0, w1, z0, idx, tile, interpret):
    if jax.default_backend() == "tpu" or interpret:
        out, y0 = _pallas_fwd(y, a0, b0, w1, z0, idx, tile, interpret)
        return out, (y0, a0, b0, w1, idx)
    out = _reference(y.astype(jnp.bfloat16), a0, b0, w1, z0, idx)
    return out, (y, a0, b0, w1, idx)


def _edge_bwd(tile, interpret, res, g):
    carrier, a0, b0, w1, idx = res
    if carrier.ndim == 4:  # pallas path: carrier is the stashed y0
        dy, dw1, dab = _pallas_bwd(carrier, a0, b0, w1, idx, g,
                                   g.shape[2], tile, interpret)
        dz0 = jnp.sum(g.astype(jnp.float32)[:, 0], axis=(0, 1))
        da0, db0 = dab[0], dab[1]
    else:  # CPU reference path: carrier is y
        dy, da0, db0, dw1, dz0 = _reference_bwd(carrier, a0, b0, w1,
                                                idx, g)
    return (dy.astype(jnp.bfloat16), da0, db0, dw1.astype(w1.dtype),
            dz0, None)


edge_delta_mlp.defvjp(_edge_fwd, _edge_bwd)
