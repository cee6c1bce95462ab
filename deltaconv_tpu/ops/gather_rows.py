"""Fused neighbor-table gather (Pallas).

``gather_rows(table, idx)``: ``[B, N, C], [B, N, K] -> [B, C, K, N]``
exact row gather via one-hot MXU matmuls — XLA's native gather on TPU
runs ~9 GB/s (~80x below HBM), which made the ``[B, N, K, 9]``
neighbor-table fetch the single most expensive stage of the fused
operator build (~4.8 ms of an ~8 ms build at B=32, N=1024, K=20).

Same recipe as :mod:`.gather_max`: the table is split h = hi + lo
(both bf16) and stacked on the contraction axis, so ONE bf16 dot per
tile reconstructs the rows exactly in the f32 accumulator. The output
is COMPONENT-major (``[B, C, K, N]``): the sole consumer (the fused
WLS build) does all its math on per-component ``[B, K, N]`` planes
with points on the 128 lanes, and producing that layout directly in
the kernel (one small in-VMEM transpose per tile) removes two
full-tensor XLA layout copies (2 x 0.45 ms at B=32, N=1024) that a
``[B, K, N, C]`` output forced on the consumer side.

Gradients flow to ``table`` (the one-hot contraction is linear): the
VJP is a segment-sum over edges, expressed as the TRANSPOSED one-hot
matmul in a second Pallas kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gather_max import build_onehot, split_hilo

__all__ = ["gather_rows", "scatter_rows"]

# Column width above which the large-N kernels split the one-hot
# into static blocks (tests shrink this to exercise the path).
_MAX_ONEHOT_COLS = 1024


def _pad_to(x, multiple, axis):
    pad = (-x.shape[axis]) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _fwd_kernel(idx_ref, hilo_ref, out_ref, *, k, n):
    t = idx_ref.shape[1]
    c = hilo_ref.shape[2] // 2
    onehot = build_onehot(idx_ref, t, n, k)  # [K*T, N]
    both = jnp.dot(onehot, hilo_ref[0],
                   preferred_element_type=jnp.float32)  # [K*T, 2C]
    val = both[:, :c] + both[:, c:]
    # Component-major output: one small [K*T, C] -> [C, K*T] transpose
    # in VMEM; edge e = kk*t + tt splits back into (kk, tt).
    out_ref[0] = val.T.reshape(c, k, t)


def _block_cols(n):
    """Ceil-division column blocking for the large-N kernels:
    ``(nb, w, n_tab)`` with ``w`` a multiple of 8 (sublane-aligned
    table-row slices) and ``n_tab = nb * w >= n``. The table is padded
    with zero rows up to ``n_tab``; padded columns can never match an
    index (all indices are < n), so no masking is needed."""
    nb = -(-n // _MAX_ONEHOT_COLS)
    w = -(-n // nb)
    w = w + ((-w) % 8)
    return nb, w, nb * w


def _fwd_kernel_blocked(idx_ref, hilo_ref, out_ref, *, k, n, nb):
    """Large-N variant: the [K*T, N] one-hot is built and contracted
    in ``nb`` static column blocks of N/nb, keeping VMEM flat in N
    while the 128-wide point tile (which the component-major output
    block REQUIRES on its lane axis) stays fixed. Same compare count
    and the same proven kernel structure as the single-block path.
    ``n`` here is the padded table length (a multiple of ``nb``)."""
    t = idx_ref.shape[1]
    c = hilo_ref.shape[2] // 2
    w = n // nb
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (t, w), 1)
    idx = idx_ref[0]  # [T, K]
    val = jnp.zeros((k * t, c), jnp.float32)
    for b0 in range(nb):
        ones = [
            ((idx[:, kk] - b0 * w)[:, None] == col_iota
             ).astype(jnp.bfloat16)
            for kk in range(k)
        ]
        onehot = jnp.concatenate(ones, axis=0)  # [K*T, W]
        both = jnp.dot(onehot, hilo_ref[0, b0 * w:(b0 + 1) * w, :],
                       preferred_element_type=jnp.float32)
        val = val + both[:, :c] + both[:, c:]
    out_ref[0] = val.T.reshape(c, k, t)


def _bwd_kernel(idx_ref, g_ref, dt_ref, *, k, n):
    """dtable[m, c] = sum over edges (t, kk) with idx[t, kk] == m of
    g[kk, t, c] — the transposed one-hot contraction, accumulated over
    the point-tile grid axis.

    The cotangent arrives PRE-SPLIT hi/lo (``[2C, K, T]`` bf16, built
    behind an optimization_barrier in ``_scatter_impl``): splitting
    inside the kernel is unsafe — the compiler (XLA in interpret mode,
    and newer Mosaic pipelines) cancels ``g - f32(bf16(g))`` to zero,
    silently degrading the backward to single-bf16 (~0.4% relative;
    caught by the TPU gradient tests)."""
    t = idx_ref.shape[1]
    c2 = g_ref.shape[1]
    onehot = build_onehot(idx_ref, t, n, k)  # [K*T, N]
    g = g_ref[0]  # [2C, K, T] bf16 (hi stacked on lo)
    gf = g.reshape(c2, k * t).T  # [K*T, 2C]
    both = jnp.dot(onehot.T, gf, preferred_element_type=jnp.float32)
    acc = both[:, :c2 // 2] + both[:, c2 // 2:]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dt_ref[0] = jnp.zeros_like(dt_ref[0])

    dt_ref[0] += acc


def _bwd_kernel_blocked(idx_ref, g_ref, dt_ref, *, k, n, nb):
    """Large-N backward: column-blocked transposed one-hot matmuls
    (see ``_fwd_kernel_blocked``); cotangent pre-split hi/lo like
    ``_bwd_kernel``. ``n`` is the padded table length (a multiple of
    ``nb``)."""
    t = idx_ref.shape[1]
    w = n // nb
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (t, w), 1)
    idx = idx_ref[0]
    c2 = g_ref.shape[1]
    g = g_ref[0]  # [2C, K, T] bf16
    gf = g.reshape(c2, k * t).T  # [K*T, 2C]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dt_ref[0] = jnp.zeros_like(dt_ref[0])

    for b0 in range(nb):
        ones = [
            ((idx[:, kk] - b0 * w)[:, None] == col_iota
             ).astype(jnp.bfloat16)
            for kk in range(k)
        ]
        onehot = jnp.concatenate(ones, axis=0)  # [K*T, W]
        both = jnp.dot(onehot.T, gf, preferred_element_type=jnp.float32)
        dt_ref[0, b0 * w:(b0 + 1) * w, :] += (
            both[:, :c2 // 2] + both[:, c2 // 2:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def gather_rows(table, idx, tile=128, interpret=False, pad_cols=False):
    """``table [B, N, C], idx [B, N, K] -> [B, C, K, N]`` exact gather
    (``out[b, c, kk, i] = table[b, idx[b, i, kk], c]``), differentiable
    in ``table``. With ``pad_cols=True`` the output keeps C padded up
    to a multiple of 8 (zero planes) — avoids a full-tensor slice copy
    when the caller indexes components individually."""
    return _fwd(table, idx, tile, interpret, pad_cols)


_VMEM_BUDGET = 12 * 2**20


def _fwd(table, idx, tile, interpret, pad_cols=False):
    from .gather_max import fit_tile

    b, n, c_in = table.shape
    k = idx.shape[-1]
    # Wide tables at large N: the whole [N, 2C] hi/lo table rides VMEM
    # — when it alone crowds the scoped budget, gather half the
    # channels per kernel and concatenate (exact; the one-hot build
    # repeats, the matmuls don't).
    if not pad_cols and c_in > 8 and n * 2 * (c_in + 8) * 2 > \
            _VMEM_BUDGET // 2:
        h = (c_in + 1) // 2
        left = _fwd(table[..., :h], idx, tile, interpret)
        right = _fwd(table[..., h:], idx, tile, interpret)
        return jnp.concatenate([left, right], axis=1)
    tile = fit_tile(tile, k * (2 * n + 12 * c_in))
    # The component-major output block puts the point tile on the LANE
    # axis, which must stay 128-wide; when the all-slots one-hot
    # doesn't fit VMEM at that width (large N), column-block it by
    # ceil division (any N works; the table pads to nb * w rows).
    nb, n_tab = 1, n
    if tile < 128:
        tile = 128
        if n > _MAX_ONEHOT_COLS:
            nb, _, n_tab = _block_cols(n)
    idx_p = _pad_to(idx.astype(jnp.int32), tile, 1)
    n_pad = idx_p.shape[1]

    # Pad the (tiny) column count to a multiple of 8 so the hi/lo
    # lane-halves split on a sublane-friendly boundary.
    c = c_in + ((-c_in) % 8)
    tf = _pad_to(table.astype(jnp.float32), 8, 2)
    if n_tab != n:
        tf = jnp.pad(tf, ((0, 0), (0, n_tab - n), (0, 0)))
    hilo, _ = split_hilo(tf)  # [B, N_tab, 2C] (tf is f32: always paired)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel_blocked, k=k, n=n_tab, nb=nb)
        if nb > 1 else functools.partial(_fwd_kernel, k=k, n=n),
        grid=(b, n_pad // tile),
        in_specs=[
            pl.BlockSpec((1, tile, k), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tab, 2 * c), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, k, tile), lambda ib, it: (ib, 0, 0, it),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, k, n_pad), jnp.float32),
        interpret=interpret,
    )(idx_p, hilo)
    # Keep the padded component planes: slicing them off here would
    # force a copy of the whole [B, C, K, N] block; callers index
    # components individually anyway.
    out = out[..., :n]
    return out if pad_cols else out[:, :c_in]


def _gather_rows_fwd(table, idx, tile, interpret, pad_cols):
    return _fwd(table, idx, tile, interpret, pad_cols), (
        idx, table.shape, jnp.zeros((0,), table.dtype))


def scatter_rows(g, idx, n_out, tile=128, interpret=False):
    """Transposed gather: scatter-add per-edge rows back to the table.

    ``g [B, C, K, N] (component-major edge rows), idx [B, N, K] ->
    [B, n_out, C]`` with ``out[b, m, c] = sum over (i, kk) with
    idx[b, i, kk] == m of g[b, c, kk, i]`` — exact (hi/lo cotangent
    split) transposed one-hot matmuls. This IS :func:`gather_rows`'s
    backward, exposed for other k-sparse linear ops (coef_apply VJPs)
    whose gradients are edge-row scatters.
    """
    return _scatter_impl(g, idx, (g.shape[0], n_out, g.shape[1]),
                         tile, interpret)


def _gather_rows_bwd(tile, interpret, pad_cols, res, g):
    idx, tshape, dtype_carrier = res
    dt = _scatter_impl(g, idx, tshape, tile, interpret)
    return dt.astype(dtype_carrier.dtype), None


def _scatter_impl(g, idx, tshape, tile, interpret):
    from .gather_max import fit_tile

    b, n, c_in = tshape
    c = g.shape[1]
    k = idx.shape[-1]
    # The [N, C] f32 accumulator persists across the whole grid; split
    # channels while it alone crowds the scoped budget (observed:
    # C=512 at N=8192 allocates 28.6 MB > 16 MB).
    if c > 8 and n * 4 * c > _VMEM_BUDGET // 2:
        h = (c + 1) // 2
        left = _scatter_impl(g[:, :h], idx, (b, n, h), tile, interpret)
        right = _scatter_impl(g[:, h:], idx, (b, n, c - h), tile,
                              interpret)
        return jnp.concatenate([left, right], axis=2)[..., :c_in]
    tile = fit_tile(tile, k * (2 * n + 12 * c), fixed_bytes=n * 4 * c)
    nb, n_tab = 1, n
    if tile < 128:
        tile = 128
        # Column width sized to what remains after the accumulator,
        # the cotangent block and the hi/lo edge rows — Mosaic holds
        # BOTH the [K*T, W] one-hot and its transpose on the stack.
        fixed = n * 4 * c + tile * k * 8 * c + k * tile * c * 8
        avail = max(_VMEM_BUDGET - fixed, 2 * 2**20)
        w_cap = max(256, avail // (2 * k * tile * 2))
        if n > w_cap:
            nb = -(-n // w_cap)
            w = -(-n // nb)
            w = w + ((-w) % 8)
            n_tab = nb * w
    idx_p = _pad_to(idx.astype(jnp.int32), tile, 1)
    n_pad = idx_p.shape[1]
    g_p = _pad_to(g.astype(jnp.float32), tile, 3)
    # Exact transposed matmul: split the f32 cotangent hi/lo OUTSIDE
    # the kernel (split_hilo owns the barrier idiom; the same bug bites
    # inside the kernel body — see _bwd_kernel), stacked on the channel
    # axis so one bf16 dot per block reconstructs the f32 contraction
    # exactly (one-hot entries are exact in bf16).
    g_hilo, _ = split_hilo(g_p, axis=1)  # [B, 2C, K, N_pad]

    dt = pl.pallas_call(
        functools.partial(_bwd_kernel_blocked, k=k, n=n_tab, nb=nb)
        if nb > 1 else functools.partial(_bwd_kernel, k=k, n=n),
        grid=(b, n_pad // tile),
        in_specs=[
            pl.BlockSpec((1, tile, k), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * c, k, tile), lambda ib, it: (ib, 0, 0, it),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_tab, c), lambda ib, it: (ib, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tab, c), jnp.float32),
        interpret=interpret,
    )(idx_p, g_hilo)
    return dt[:, :n, :c_in]


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)
