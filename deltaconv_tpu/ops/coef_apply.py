"""Coefficient-form operator application (Pallas).

Applies the k-sparse grad/div operators directly from their per-edge
coefficients — the LARGE-cloud path. The dense MXU form
(``geometry.dense``) wins decisively up to a few thousand points, but
its ``[B, 2, N, N]`` matrices grow quadratically (N = 16384 at bf16 is
2 GB per operator per batch of 4); the coefficient form stays
``O(N K)`` and this kernel applies it as the usual exact one-hot
gather (hi/lo split, f32 accumulation) followed by in-VMEM weighted
sums over the K slots, instead of XLA's ~9 GB/s native gather.

  grad:  ``y[n, d, c] = sum_k g[n, k, d] * x[idx[n, k], c]``
  div:   ``y[n, c]    = sum_k sum_d d[n, k, d] * v[idx[n, k], d, c]``

Masked edges need no mask input: their coefficients are zero by
construction (Gaussian weights vanish there).

Differentiable with matmul-routed backwards: both applications are
linear in both operands, and both cotangents are k-sparse edge-row
operations — the feature cotangent is a scatter-add of per-edge rows
(``ops.gather_rows.scatter_rows``, a transposed one-hot matmul) and
the coefficient cotangent contracts gathered rows
(``ops.gather_rows.gather_rows``) with the output cotangent. XLA's
native gather/scatter (~9 GB/s on TPU) never runs; off-TPU the VJP
recomputes through the XLA reference formulation under ``jax.vjp``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gather_max import build_onehot, fit_tile, split_hilo

__all__ = ["coef_apply_grad", "coef_apply_div"]


def _pad_to(x, multiple, axis):
    pad = (-x.shape[axis]) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _per_t_bytes(k, n, cw):
    """VMEM bytes per point-tile row. Wide applies: the proven
    one-hot + 12·cw estimate (large-N configs measured fine at their
    tiles). NARROW applies (the grad-of-positions C=3 -> cw=6): the
    f32 temps pad to 128 LANES and the one-hot's concat copy is not
    elided, so the old estimate undercounted ~3.5x and OOMed scoped
    vmem at B=32, N=1024, tile=128 (observed 18.94M vs the 16M limit,
    2026-08-20) — count the one-hot twice plus lane-padded temps,
    which drops the tile to 64 there."""
    lanes = -(-cw // 128) * 128
    if 12 * cw >= 8 * lanes:
        return k * (2 * n + 12 * cw)
    return k * (4 * n + 8 * lanes)


def _fit(tile, k, n, cw):
    """Tile selection: Mosaic's true stack usage runs up to ~3x the
    operand estimate in the SMALL-N regime (concat copies + lane
    padding): measured OOMs at B=32, N=1024 — cw=6 tile 128 (18.94M)
    and cw=512 tile 32 (16.26M, 268K over the 16M limit). Small N
    gets a 4M budget with a 16-row floor; the large-N regime keeps
    the parameters its measured-good configs (N=4096/8192) ran at."""
    small = n <= 2048
    return fit_tile(tile, _per_t_bytes(k, n, cw),
                    budget=(4 if small else 10) * 2**20,
                    floor=16 if small else 32)


def _grad_kernel(idx_ref, w_ref, hilo_ref, out_ref, *, k, n, paired):
    t = idx_ref.shape[1]
    c = hilo_ref.shape[2] // (2 if paired else 1)
    onehot = build_onehot(idx_ref, t, n, k)
    both = jnp.dot(onehot, hilo_ref[0],
                   preferred_element_type=jnp.float32)  # [K*T, 2C|C]
    val = both[:, :c] + both[:, c:] if paired else both
    acc0 = jnp.zeros((t, c), jnp.float32)
    acc1 = jnp.zeros((t, c), jnp.float32)
    for kk in range(k):
        vk = val[kk * t:(kk + 1) * t, :]
        acc0 = acc0 + vk * w_ref[0, :, kk, 0][:, None]
        acc1 = acc1 + vk * w_ref[0, :, kk, 1][:, None]
    out_ref[0, 0] = acc0.astype(out_ref.dtype)
    out_ref[0, 1] = acc1.astype(out_ref.dtype)


def _div_kernel(idx_ref, w_ref, hilo_ref, out_ref, *, k, n, c,
                paired):
    """Table is the FLATTENED vector field ``[N, 2C]`` (components
    side by side); each k contracts both component halves with its two
    coefficient planes."""
    t = idx_ref.shape[1]
    onehot = build_onehot(idx_ref, t, n, k)
    both = jnp.dot(onehot, hilo_ref[0],
                   preferred_element_type=jnp.float32)  # [K*T, 4C|2C]
    val = (both[:, :2 * c] + both[:, 2 * c:]) if paired \
        else both  # [K*T, 2C]
    acc = jnp.zeros((t, c), jnp.float32)
    for kk in range(k):
        vk = val[kk * t:(kk + 1) * t, :]
        acc = acc + vk[:, :c] * w_ref[0, :, kk, 0][:, None]
        acc = acc + vk[:, c:] * w_ref[0, :, kk, 1][:, None]
    out_ref[0] = acc.astype(out_ref.dtype)


def _reference_grad(x, coef, idx):
    xg = jax.vmap(lambda a, i: a[i])(x, idx)  # [B, N, K, C]
    return jnp.einsum("bnkd,bnkc->bndc", coef,
                      xg.astype(jnp.float32),
                      precision=lax.Precision.HIGHEST).astype(x.dtype)


def _reference_div(v, coef, idx):
    vg = jax.vmap(lambda a, i: a[i])(v, idx)  # [B, N, K, 2, C]
    return jnp.einsum("bnkd,bnkdc->bnc", coef,
                      vg.astype(jnp.float32),
                      precision=lax.Precision.HIGHEST).astype(v.dtype)


def _grad_fwd_pallas(x, coef, idx, tile, interpret):
    b, n, c = x.shape
    k = idx.shape[-1]
    hilo, paired = split_hilo(x)
    cw = hilo.shape[-1]
    tile = _fit(tile, k, n, cw)
    idx_p = _pad_to(idx.astype(jnp.int32), tile, 1)
    coef_p = _pad_to(coef.astype(jnp.float32), tile, 1)
    n_pad = idx_p.shape[1]

    out = pl.pallas_call(
        functools.partial(_grad_kernel, k=k, n=n, paired=paired),
        grid=(b, n_pad // tile),
        in_specs=[
            pl.BlockSpec((1, tile, k), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, k, 2), lambda ib, it: (ib, it, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, cw), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, tile, c),
                               lambda ib, it: (ib, 0, it, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, n_pad, c), x.dtype),
        interpret=interpret,
    )(idx_p, coef_p, hilo)
    # Component-leading in the kernel (mid-dim slice stores crash the
    # v5e Mosaic helper); swap to the model's [..., N, 2, C] outside.
    return jnp.swapaxes(out[:, :, :n], 1, 2)


def _div_fwd_pallas(v, coef, idx, tile, interpret):
    b, n, _, c = v.shape
    k = idx.shape[-1]
    flat = v.reshape(b, n, 2 * c)
    hilo, paired = split_hilo(flat)
    cw = hilo.shape[-1]
    tile = _fit(tile, k, n, cw)
    idx_p = _pad_to(idx.astype(jnp.int32), tile, 1)
    coef_p = _pad_to(coef.astype(jnp.float32), tile, 1)
    n_pad = idx_p.shape[1]

    out = pl.pallas_call(
        functools.partial(_div_kernel, k=k, n=n, c=c, paired=paired),
        grid=(b, n_pad // tile),
        in_specs=[
            pl.BlockSpec((1, tile, k), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, k, 2), lambda ib, it: (ib, it, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, cw), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda ib, it: (ib, it, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c), v.dtype),
        interpret=interpret,
    )(idx_p, coef_p, hilo)
    return out[:, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def coef_apply_grad(x, coef, idx, tile=128, interpret=False):
    """``x [B, N, C], coef [B, N, K, 2], idx [B, N, K] ->
    [B, N, 2, C]`` — the coefficient-form gradient application."""
    if jax.default_backend() == "tpu" or interpret:
        return _grad_fwd_pallas(x, coef, idx, tile, interpret)
    return _reference_grad(x, coef, idx)


def _cag_fwd(x, coef, idx, tile, interpret):
    return coef_apply_grad(x, coef, idx, tile, interpret), \
        (x, coef, idx)


def _cag_bwd(tile, interpret, res, ct):
    x, coef, idx = res
    if not (jax.default_backend() == "tpu" or interpret):
        _, vjp = jax.vjp(lambda xx, cc: _reference_grad(xx, cc, idx),
                         x, coef)
        dx, dc = vjp(ct)
        return dx, dc, None

    from .gather_rows import gather_rows, scatter_rows

    ctf = ct.astype(jnp.float32)
    cf = coef.astype(jnp.float32)
    # dx[m, c] = sum over edges (n, kk) with idx == m of
    #            sum_d coef[n, kk, d] * ct[n, d, c]
    # — component-major edge rows fed to the transposed one-hot matmul.
    edge = jnp.einsum("bnkd,bndc->bckn", cf, ctf,
                      precision=lax.Precision.HIGHEST)
    dx = scatter_rows(edge, idx, x.shape[1], tile, interpret)
    # dcoef[n, kk, d] = sum_c x[idx[n, kk], c] * ct[n, d, c]
    xg = gather_rows(x.astype(jnp.float32), idx, tile, interpret)
    dc = jnp.einsum("bckn,bndc->bnkd", xg, ctf,
                    precision=lax.Precision.HIGHEST)
    return dx.astype(x.dtype), dc.astype(coef.dtype), None


coef_apply_grad.defvjp(_cag_fwd, _cag_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def coef_apply_div(v, coef, idx, tile=128, interpret=False):
    """``v [B, N, 2, C], coef [B, N, K, 2], idx [B, N, K] ->
    [B, N, C]`` — the coefficient-form divergence application."""
    if jax.default_backend() == "tpu" or interpret:
        return _div_fwd_pallas(v, coef, idx, tile, interpret)
    return _reference_div(v, coef, idx)


def _cad_fwd(v, coef, idx, tile, interpret):
    return coef_apply_div(v, coef, idx, tile, interpret), \
        (v, coef, idx)


def _cad_bwd(tile, interpret, res, ct):
    v, coef, idx = res
    if not (jax.default_backend() == "tpu" or interpret):
        _, vjp = jax.vjp(lambda vv, cc: _reference_div(vv, cc, idx),
                         v, coef)
        dv, dc = vjp(ct)
        return dv, dc, None

    from .gather_rows import gather_rows, scatter_rows

    b, n, _, c = v.shape
    k = idx.shape[-1]
    ctf = ct.astype(jnp.float32)
    cf = coef.astype(jnp.float32)
    # dv[m, d, c] = sum over edges with idx == m of coef[., d] * ct[., c]
    # — flattened [2C] rows matching _div_kernel's table layout.
    edge = jnp.einsum("bnkd,bnc->bdckn", cf, ctf,
                      precision=lax.Precision.HIGHEST)
    dv = scatter_rows(edge.reshape(b, 2 * c, k, n), idx, n, tile,
                      interpret)
    # dcoef[n, kk, d] = sum_c v[idx[n, kk], d, c] * ct[n, c]
    vg = gather_rows(v.reshape(b, n, 2 * c).astype(jnp.float32), idx,
                     tile, interpret)
    dc = jnp.einsum("bdckn,bnc->bnkd", vg.reshape(b, 2, c, k, n), ctf,
                    precision=lax.Precision.HIGHEST)
    return (dv.reshape(b, n, 2, c).astype(v.dtype),
            dc.astype(coef.dtype), None)


coef_apply_div.defvjp(_cad_fwd, _cad_bwd)
