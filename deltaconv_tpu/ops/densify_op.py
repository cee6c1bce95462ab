"""Pallas dense-operator assembly.

Materializes the per-edge grad/div coefficients into the dense MXU
matrices (``W_grad [B, 2, N, N]``, ``W_div [B, 2, N, N]``) without the
XLA one-hot einsum's ``[B, N, K, N]`` HBM intermediate (~2.7 GB of
traffic at B=32, N=1024, K=20 — ~3 ms). Each point tile builds its
rows in VMEM with K masked select-accumulates per plane and writes the
final dtype directly.

Forward is LINEAR in the coefficients; the VJP gathers the cotangent
matrices back to per-edge slots with the same one-hot compares
(a row-local gather: ``d_coef[n, k] = dW[n, idx[n, k]]``).

Layouts: coefficient planes arrive as four ``[B, N, K]`` arrays
(g1, g2, d1, d2); outputs put the point-row axis on sublanes and the
neighbor-column axis on lanes, as component-major ``[B, 2, N, N]``
planes consumed directly by ``geometry.dense.DenseGradDiv``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["densify_coefs", "densify_coef_planes", "densify_coefs_int8"]


def _pad_to(x, multiple, axis):
    pad = (-x.shape[axis]) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _round_bf16_bits(x):
    """f32 [T, K] -> int32 whose TOP 16 bits are the round-to-nearest-
    even bf16 encoding (bottom 16 bits zero). -0.0 is canonicalized to
    all-zero bits (in the bit domain — ``x + 0.0`` gets simplified away
    by XLA) so an OR against a duplicate-column zero coefficient can
    never flip a sign bit."""
    u = jax.lax.bitcast_convert_type(x, jnp.int32)
    u = jnp.where((u & jnp.int32(0x7FFFFFFF)) == 0, 0, u)
    rounded = u + 0x7FFF + ((u >> 16) & 1)
    return rounded & jnp.int32(-65536)


def _fwd_kernel(idx_ref, g1_ref, g2_ref, d1_ref, d2_ref,
                wg_ref, wd_ref, *, k, n):
    """Each point places its K coefficients into its dense row via K
    masked select-accumulates in f32."""
    t = idx_ref.shape[1]
    dt = wg_ref.dtype
    col = jax.lax.broadcasted_iota(jnp.int32, (t, n), 1)
    idx16 = idx_ref[0]
    zero = jnp.zeros((t, n), jnp.float32)
    ag1, ag2, ad1, ad2 = zero, zero, zero, zero
    for kk in range(k):
        hit = idx16[:, kk][:, None] == col
        ag1 = ag1 + jnp.where(hit, g1_ref[0, :, kk][:, None], 0.0)
        ag2 = ag2 + jnp.where(hit, g2_ref[0, :, kk][:, None], 0.0)
        ad1 = ad1 + jnp.where(hit, d1_ref[0, :, kk][:, None], 0.0)
        ad2 = ad2 + jnp.where(hit, d2_ref[0, :, kk][:, None], 0.0)
    wg_ref[0, 0] = ag1.astype(dt)
    wg_ref[0, 1] = ag2.astype(dt)
    wd_ref[0, 0] = ad1.astype(dt)
    wd_ref[0, 1] = ad2.astype(dt)


def _fwd_kernel_bf16(idx_ref, g1_ref, g2_ref, d1_ref, d2_ref,
                     wg_ref, wd_ref, *, k, n):
    """bf16-output fast path: each accumulator carries TWO bf16 planes
    packed in one int32 lane. Dense assembly is pure PLACEMENT — every
    k writes a distinct column (padded slots clamp to self with +0.0
    coefficients) — so bitwise OR accumulates exactly, and the packed
    pair halves the per-k select/accumulate passes (the kernel's
    entire cost). Values are rounded to bf16 (nearest-even) before
    packing, matching the f32 kernel's final astype."""
    t = idx_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (t, n), 1)
    idx16 = idx_ref[0]
    # [T, K] packed pairs: g2 in the top 16 bits, g1 in the bottom.
    pg = _round_bf16_bits(g2_ref[0]) | (
        (_round_bf16_bits(g1_ref[0]) >> 16) & jnp.int32(0xFFFF))
    pd = _round_bf16_bits(d2_ref[0]) | (
        (_round_bf16_bits(d1_ref[0]) >> 16) & jnp.int32(0xFFFF))
    zero = jnp.zeros((t, n), jnp.int32)
    ag, ad = zero, zero
    for kk in range(k):
        hit = idx16[:, kk][:, None] == col
        ag = ag | jnp.where(hit, pg[:, kk][:, None], 0)
        ad = ad | jnp.where(hit, pd[:, kk][:, None], 0)
    # Unpack: bf16 bits in the TOP half of an int32 ARE that value as
    # a (truncated-mantissa) f32.
    def hi(a):
        return jax.lax.bitcast_convert_type(a & jnp.int32(-65536),
                                            jnp.float32)

    def lo(a):
        return jax.lax.bitcast_convert_type(a << 16, jnp.float32)

    dt = wg_ref.dtype
    wg_ref[0, 0] = lo(ag).astype(dt)
    wg_ref[0, 1] = hi(ag).astype(dt)
    wd_ref[0, 0] = lo(ad).astype(dt)
    wd_ref[0, 1] = hi(ad).astype(dt)


def _fwd_kernel_int8(idx_ref, p_ref, wg_ref, wd_ref, *, k, n):
    """int8-output serving path: ALL FOUR planes ride in ONE int32
    accumulator (one byte each), so the per-k select/OR loop — the
    kernel's entire cost — runs HALF the passes of the bf16 pair-packed
    kernel, and the int8 outputs halve the HBM writes again. The OR
    accumulates exactly for the same reason as the bf16 kernel: dense
    assembly is pure placement (distinct columns per k; padded slots
    carry quantized-zero bytes). Values arrive pre-quantized and
    byte-packed (g1 | g2<<8 | d1<<16 | d2<<24); sub-32-bit selects
    crash Mosaic on v5e, so everything stays int32 until the final
    sign-extending byte extraction."""
    t = idx_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (t, n), 1)
    idx16 = idx_ref[0]
    pk = p_ref[0]  # [T, K] packed 4x int8
    acc = jnp.zeros((t, n), jnp.int32)
    for kk in range(k):
        hit = idx16[:, kk][:, None] == col
        acc = acc | jnp.where(hit, pk[:, kk][:, None], 0)

    def byte(shift):  # sign-extended byte at bits [shift, shift+8)
        return ((acc << (24 - shift)) >> 24).astype(jnp.int8)

    wg_ref[0, 0] = byte(0)
    wg_ref[0, 1] = byte(8)
    wd_ref[0, 0] = byte(16)
    wd_ref[0, 1] = byte(24)


def _quantize_pack(grad_coef, div_coef):
    """Per-cloud symmetric int8 quantization of the four coefficient
    planes, byte-packed into one int32 per edge. Returns
    ``(packed [B, N, K] i32, s_grad [B], s_div [B])`` with
    ``W ~= W_q * s / 127``."""
    red = tuple(range(1, grad_coef.ndim))
    sg = jnp.maximum(jnp.max(jnp.abs(grad_coef), axis=red), 1e-30)
    sd = jnp.maximum(jnp.max(jnp.abs(div_coef), axis=red), 1e-30)

    def q(p, s):
        v = jnp.round(p / s[:, None, None] * 127.0)
        return jnp.clip(v, -127, 127).astype(jnp.int32)

    qg1 = q(grad_coef[..., 0], sg)
    qg2 = q(grad_coef[..., 1], sg)
    qd1 = q(div_coef[..., 0], sd)
    qd2 = q(div_coef[..., 1], sd)
    packed = ((qg1 & 0xFF) | ((qg2 & 0xFF) << 8)
              | ((qd1 & 0xFF) << 16) | ((qd2 & 0xFF) << 24))
    return packed, sg, sd


def densify_coefs_int8(idx, grad_coef, div_coef, tile=128,
                       interpret=False):
    """``idx [B, N, K], grad/div_coef [B, N, K, 2] -> (w_grad i8,
    w_div i8, s_grad [B], s_div [B])`` — the opt-in quantized serving
    form, ``W ~= W_q * s / 127`` (symmetric per-cloud scales).
    Forward-only (no VJP): int8 operators are for eval/serving."""
    b, n, k = idx.shape
    packed, sg, sd = _quantize_pack(grad_coef, div_coef)
    idx_p = _pad_to(idx.astype(jnp.int32), tile, 1)
    packed_p = _pad_to(packed, tile, 1)
    n_pad = idx_p.shape[1]
    tk = pl.BlockSpec((1, tile, k), lambda ib, it: (ib, it, 0),
                      memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, 2, tile, n), lambda ib, it: (ib, 0, it, 0),
                          memory_space=pltpu.VMEM)
    wg, wd = pl.pallas_call(
        functools.partial(_fwd_kernel_int8, k=k, n=n),
        grid=(b, n_pad // tile),
        in_specs=[tk, tk],
        out_specs=[w_spec, w_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, 2, n_pad, n), jnp.int8),
            jax.ShapeDtypeStruct((b, 2, n_pad, n), jnp.int8),
        ],
        interpret=interpret,
    )(idx_p, packed_p)
    return (wg[:, :, :n], wd[:, :, :n],
            sg / jnp.float32(127.0), sd / jnp.float32(127.0))


def _bwd_kernel(idx_ref, dwg_ref, dwd_ref,
                dg1_ref, dg2_ref, dd1_ref, dd2_ref, *, k, n):
    """Row-local gather of the cotangents: ``d_coef[t, kk] =
    dW[t, idx[t, kk]]`` via one-hot compare + lane reduction."""
    t = idx_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (t, n), 1)
    idx16 = idx_ref[0]
    dwg1 = dwg_ref[0, 0]
    dwg2 = dwg_ref[0, 1]
    dwd1 = dwd_ref[0, 0]
    dwd2 = dwd_ref[0, 1]
    for kk in range(k):
        hit = idx16[:, kk][:, None] == col
        dg1_ref[0, :, kk] = jnp.sum(jnp.where(hit, dwg1, 0.0), axis=1)
        dg2_ref[0, :, kk] = jnp.sum(jnp.where(hit, dwg2, 0.0), axis=1)
        dd1_ref[0, :, kk] = jnp.sum(jnp.where(hit, dwd1, 0.0), axis=1)
        dd2_ref[0, :, kk] = jnp.sum(jnp.where(hit, dwd2, 0.0), axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def densify_coefs(idx, grad_coef, div_coef, dtype_name="float32",
                  tile=128, interpret=False):
    """``idx [B, N, K], grad/div_coef [B, N, K, 2] ->
    (w_grad [B, 2, N, N], w_div [B, 2, N, N])`` in ``dtype_name``.

    Coefficients of masked edges must already be zero (they are, by
    construction — gaussian_weights zeroes them), so no mask input."""
    return _fwd(idx, grad_coef, div_coef, dtype_name, tile, interpret)


def _fwd(idx, grad_coef, div_coef, dtype_name, tile, interpret):
    planes = [grad_coef[..., 0], grad_coef[..., 1],
              div_coef[..., 0], div_coef[..., 1]]
    return densify_coef_planes(idx, *planes, dtype_name=dtype_name,
                               tile=tile, interpret=interpret)


def densify_coef_planes(idx, g1, g2, d1, d2, dtype_name="float32",
                        tile=128, interpret=False):
    """Plane-based entry (``[B, N, K]`` per coefficient): same kernel
    as :func:`densify_coefs` without requiring the ``[..., 2]``
    stacked layout (the fused gather+WLS build outputs planes).
    Forward-only."""
    b, n, k = idx.shape
    dtype = jnp.dtype(dtype_name)
    idx_p = _pad_to(idx.astype(jnp.int32), tile, 1)
    n_pad = idx_p.shape[1]
    planes = [_pad_to(p.astype(jnp.float32), tile, 1)
              for p in (g1, g2, d1, d2)]
    tk = pl.BlockSpec((1, tile, k), lambda ib, it: (ib, it, 0),
                      memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, 2, tile, n), lambda ib, it: (ib, 0, it, 0),
                          memory_space=pltpu.VMEM)
    kern = _fwd_kernel_bf16 if dtype == jnp.bfloat16 else _fwd_kernel
    wg, wd = pl.pallas_call(
        functools.partial(kern, k=k, n=n),
        grid=(b, n_pad // tile),
        in_specs=[tk] * 5,
        out_specs=[w_spec, w_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, 2, n_pad, n), dtype),
            jax.ShapeDtypeStruct((b, 2, n_pad, n), dtype),
        ],
        interpret=interpret,
    )(idx_p, *planes)
    return wg[:, :, :n], wd[:, :, :n]


def _densify_fwd(idx, grad_coef, div_coef, dtype_name, tile, interpret):
    out = _fwd(idx, grad_coef, div_coef, dtype_name, tile, interpret)
    return out, (idx, jnp.zeros((0,), grad_coef.dtype))


def _densify_bwd(dtype_name, tile, interpret, res, cts):
    idx, dtype_carrier = res
    dwg, dwd = cts
    b, n, k = idx.shape
    idx_p = _pad_to(idx.astype(jnp.int32), tile, 1)
    n_pad = idx_p.shape[1]
    dwg_p = _pad_to(dwg.astype(jnp.float32), tile, 2)
    dwd_p = _pad_to(dwd.astype(jnp.float32), tile, 2)

    tk = pl.BlockSpec((1, tile, k), lambda ib, it: (ib, it, 0),
                      memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, 2, tile, n), lambda ib, it: (ib, 0, it, 0),
                          memory_space=pltpu.VMEM)
    grads = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k, n=n),
        grid=(b, n_pad // tile),
        in_specs=[tk, w_spec, w_spec],
        out_specs=[tk] * 4,
        out_shape=[jax.ShapeDtypeStruct((b, n_pad, k), jnp.float32)] * 4,
        interpret=interpret,
    )(idx_p, dwg_p, dwd_p)
    dg1, dg2, dd1, dd2 = [g[:, :n] for g in grads]
    hdt = dtype_carrier.dtype
    d_grad = jnp.stack([dg1, dg2], axis=-1).astype(hdt)
    d_div = jnp.stack([dd1, dd2], axis=-1).astype(hdt)
    return None, d_grad, d_div


densify_coefs.defvjp(_densify_fwd, _densify_bwd)
