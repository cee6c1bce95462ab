"""Fused kNN kernel: pairwise scores + iterative top-k in VMEM.

The XLA path materializes the ``[B, N, N]`` score matrix in HBM and
runs ``lax.approx_max_k`` over it (~2 ms device at B=32, N=1024). This
kernel computes each query tile's score rows in VMEM (three FMA passes
— the contraction dimension is 3, no MXU needed) and extracts the k
best columns with k exact (max, argmin-of-ties, mask) sweeps, so
nothing ever round-trips HBM except the ``[B, N, K]`` index output.

Scores are f32 (products of f32 VPU ops — no matmul rounding), ties
break to the LOWEST index, and the self column is pinned to slot 0,
matching `geometry.knn`'s conventions. Used for the unmasked
``method="approx"`` path (semantics are actually exact top-k here,
strictly better than approx_max_k's 0.95 recall).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["knn_topk", "knn_topk_table"]

_BIG = 1e30


def _scores(pos_ref, post_ref, sq_ref, tile):
    t0 = pl.program_id(1) * tile
    q = pos_ref[0]  # [T, 3]
    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]  # [T, 1]
    px = post_ref[0, 0:1, :]  # [1, N]
    py = post_ref[0, 1:2, :]
    pz = post_ref[0, 2:3, :]
    # score = 2 q.p - |p|^2  (= |q|^2 - d^2; row shifts don't change
    # per-row order).
    s = 2.0 * (qx * px + qy * py + qz * pz) - sq_ref[0]  # [T, N]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    row = t0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    return s, col, row


def _kernel(pos_ref, post_ref, sq_ref, idx_ref, *md_ref, k, n, tile,
            mean_dist=False):
    s, col, row = _scores(pos_ref, post_ref, sq_ref, tile)
    s = jnp.where(col == row, 2.0 * _BIG, s)
    if mean_dist:
        q = pos_ref[0]
        qsq = jnp.sum(q * q, axis=1, keepdims=True)  # [T, 1]
        dsum = jnp.zeros_like(qsq)

    winners = []
    for _ in range(k):
        best = jnp.max(s, axis=1, keepdims=True)  # [T, 1]
        win = jnp.min(jnp.where(s >= best, col, n), axis=1,
                      keepdims=True)  # lowest-index tie-break
        winners.append(win)
        s = jnp.where(col == win, -_BIG, s)
        if mean_dist:
            # d^2 = |q|^2 - score (score = 2 q.p - |p|^2); the pinned
            # self score clamps to d = 0. Per-sweep [T, 1] ops — far
            # cheaper than a full-plane recovery pass afterwards.
            dsum = dsum + jnp.sqrt(jnp.maximum(qsq - best, 0.0))
    idx_ref[0] = jnp.concatenate(winners, axis=1).astype(jnp.int32)
    if mean_dist:
        md_ref[0][0] = dsum / float(k)


def _kernel_q(pos_ref, post_ref, sq_ref, idx_ref, *md_ref, k, n, tile,
              mean_dist=False):
    """Packed-key sweeps: (per-row 16-bit linear score | 65535 - col)
    in ONE int32, so every sweep is a single max-reduce plus a single
    compare-select (~half the VMEM traffic of the exact kernel's
    3-pass sweeps, which bound its runtime). Each row's scores are
    quantized LINEARLY onto its own [min, max] range — a monotone map,
    so ordering only changes for score gaps below range/65534 (recall
    ~0.999 on random clouds, vs approx_max_k's 0.95 target). The packed
    column makes keys unique, so ties still break to the lowest index,
    deterministically."""
    s, col, row = _scores(pos_ref, post_ref, sq_ref, tile)
    rmin = jnp.min(s, axis=1, keepdims=True)
    rmax = jnp.max(s, axis=1, keepdims=True)
    scale = 65534.0 / jnp.maximum(rmax - rmin, 1e-30)
    q = ((s - rmin) * scale).astype(jnp.int32)  # [T, N] in 0..65534
    packed = ((q - 32768) << 16) | (jnp.int32(65535) - col)
    # Self column: score bits 0x7FFF beat every clamped normal key.
    packed = jnp.where(col == row,
                       jnp.int32(0x7FFF0000) | (jnp.int32(65535) - col),
                       packed)

    if mean_dist:
        q = pos_ref[0]
        qsq = jnp.sum(q * q, axis=1, keepdims=True)  # [T, 1]
        dsum = jnp.zeros_like(qsq)

    winners = []
    for sweep in range(k):
        best = jnp.max(packed, axis=1, keepdims=True)  # [T, 1]
        winners.append(jnp.int32(65535) - (best & jnp.int32(65535)))
        packed = jnp.where(packed == best, jnp.int32(-2147483648),
                           packed)
        if mean_dist and sweep > 0:
            # Dequantized winner score (error <= row range / 65534 —
            # ~1e-4 relative on the resulting bandwidth); the sweep-0
            # self winner contributes d = 0 and is skipped.
            qb = (best >> 16) + 32768
            st = rmin + qb.astype(jnp.float32) / scale
            dsum = dsum + jnp.sqrt(jnp.maximum(qsq - st, 0.0))
    idx_ref[0] = jnp.concatenate(winners, axis=1)
    if mean_dist:
        md_ref[0][0] = dsum / float(k)


def _table_kernel(rows_ref, posq_ref, sqq_ref, post_ref, sqt_ref,
                  maskt_ref, idx_ref, bs_ref, bi_ref, *, k, n_t, tile_c,
                  nc):
    """Column-tiled running top-k: query tiles on the outer grid axis,
    table (column) tiles on the inner; ``bs_ref``/``bi_ref`` VMEM
    scratch carries each query row's best-k (score, global col) pairs
    across column tiles. Each column tile costs k sweeps over
    ``[T, k + tile_c]`` — total sweep work k*(N + k*nc) per row, the
    same as the untiled kernel's k*N, with VMEM O(T * tile_c).

    Scores are ``2 q.p - |q|^2 - |p|^2`` with f32 FMA passes — the
    same value the XLA path's HIGHEST-precision dot produces — so
    winner sets match `geometry.knn`'s dense/tiled paths bit-for-bit,
    including ties (broken to the LOWEST global column, here via the
    min-where sweep; cross-tile ties resolve the same way because the
    scratch carries global column ids). The self column is pinned to
    slot 0 with a +2*BIG score; masked/padded columns get -2*BIG and
    are never selected while k <= #valid points."""
    ic = pl.program_id(1)

    # Empty scratch slots and already-picked winners sit at -3e38 —
    # strictly below the -2*BIG masked-column score — so rows with
    # fewer than k unmasked columns still emit DISTINCT masked columns
    # in lowest-index order (as lax.top_k would) instead of repeats.
    @pl.when(ic == 0)
    def _init():
        bs_ref[...] = jnp.full_like(bs_ref, -3.0e38)
        bi_ref[...] = jnp.full_like(bi_ref, n_t)

    q = posq_ref[...]  # [T, 3]
    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]
    px = post_ref[0:1, :]  # [1, Tc]
    py = post_ref[1:2, :]
    pz = post_ref[2:3, :]
    s = 2.0 * (qx * px + qy * py + qz * pz) - sqq_ref[...] - sqt_ref[...]
    col = ic * tile_c + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    row = rows_ref[...]  # [T, 1] global row ids
    s = jnp.where(col == row, 2.0 * _BIG, s)
    s = jnp.where(maskt_ref[...] > 0.5, s, -2.0 * _BIG)

    s_aug = jnp.concatenate([bs_ref[...], s], axis=1)
    i_aug = jnp.concatenate([bi_ref[...], col], axis=1)
    new_s, new_i = [], []
    for _ in range(k):
        best = jnp.max(s_aug, axis=1, keepdims=True)  # [T, 1]
        win = jnp.min(jnp.where(s_aug >= best, i_aug, n_t), axis=1,
                      keepdims=True)
        new_s.append(best)
        new_i.append(win)
        s_aug = jnp.where(i_aug == win, -3.0e38, s_aug)
    bs_ref[...] = jnp.concatenate(new_s, axis=1)
    bi_ref[...] = jnp.concatenate(new_i, axis=1)

    @pl.when(ic == nc - 1)
    def _emit():
        idx_ref[...] = bi_ref[...]


def _table_kernel_q(rows_ref, posq_ref, sqq_ref, post_ref, sqt_ref,
                    maskt_ref, idx_ref, bs_ref, bi_ref, *, k, n_t,
                    tile_c, nc):
    """Quantized packed-key variant of ``_table_kernel`` (the same
    trade the headline's ``_kernel_q`` makes): each column tile's
    scores quantize LINEARLY onto the row's per-tile [min, max] range
    as 16 bits and pack with the LOCAL column id into ONE int32, so
    every sweep is a single max-reduce plus a single compare-select
    instead of the exact kernel's 3-pass (max, min-where, mask) over
    the ``[T, k + tile_c]`` augmented plane. Tile winners dequantize
    back to f32 and merge with the running cross-tile top-k scratch
    via k exact sweeps over the tiny ``[T, 2k]`` pair block.

    Ordering changes only for score gaps below tile-range/65533
    (recall ~0.999 on random clouds — same granularity argument as
    ``_kernel_q``); ties at quantized equality break to the lowest
    LOCAL column within a tile and the lowest GLOBAL column across
    tiles. The self column is pinned to slot 0 via the 0x7FFF score
    bits within its tile and a +2*BIG dequantized score across tiles.
    Masked/padded columns are selectable FILLERS ranked below every
    valid score (quantized slot 0 in-tile, -2*BIG across tiles — the
    exact kernel's convention), so rows with fewer than k valid
    columns emit DISTINCT masked columns in lowest-index order
    instead of duplicating already-picked winners; the cross-tile
    kill also neutralizes the killed entry's INDEX so exhausted rows
    can only fall back to the n_t empty marker."""
    ic = pl.program_id(1)

    @pl.when(ic == 0)
    def _init():
        bs_ref[...] = jnp.full_like(bs_ref, -3.0e38)
        bi_ref[...] = jnp.full_like(bi_ref, n_t)

    q = posq_ref[...]  # [T, 3]
    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]
    px = post_ref[0:1, :]  # [1, Tc]
    py = post_ref[1:2, :]
    pz = post_ref[2:3, :]
    s = 2.0 * (qx * px + qy * py + qz * pz) - sqq_ref[...] - sqt_ref[...]
    lcol = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    col = ic * tile_c + lcol
    row = rows_ref[...]  # [T, 1] global row ids
    is_self = col == row
    valid = (maskt_ref[...] > 0.5) & jnp.logical_not(is_self)

    # Per-row per-tile linear 16-bit quantization over VALID scores
    # (self/masked excluded so outliers don't crush the range).
    s_v = jnp.where(valid, s, jnp.inf)
    rmin = jnp.min(s_v, axis=1, keepdims=True)
    s_v = jnp.where(valid, s, -jnp.inf)
    rmax = jnp.max(s_v, axis=1, keepdims=True)
    rmin = jnp.where(jnp.isfinite(rmin), rmin, 0.0)
    rmax = jnp.where(jnp.isfinite(rmax), rmax, 0.0)
    scale = 65533.0 / jnp.maximum(rmax - rmin, 1e-30)
    # Valid scores quantize to 1..65534 — slot 0 is reserved for the
    # masked-column FILLERS (ranked below every valid candidate, like
    # the exact kernel's -2*BIG), 0x7FFF for the self column.
    qs = jnp.clip(((s - rmin) * scale).astype(jnp.int32) + 1, 1, 65534)
    packed = ((qs - 32768) << 16) | (jnp.int32(65535) - lcol)
    packed = jnp.where(is_self,
                       jnp.int32(0x7FFF0000) | (jnp.int32(65535) - lcol),
                       packed)
    packed = jnp.where(
        valid | is_self, packed,
        (jnp.int32(-32768) << 16) | (jnp.int32(65535) - lcol))

    tile_s, tile_i = [], []
    for _ in range(k):
        best = jnp.max(packed, axis=1, keepdims=True)  # [T, 1]
        packed = jnp.where(packed == best, jnp.int32(-2147483648),
                           packed)
        win_l = jnp.int32(65535) - (best & jnp.int32(65535))
        qb = (best >> 16) + 32768
        st = rmin + (qb - 1).astype(jnp.float32) / scale
        # Self keeps its +2*BIG rank across tiles; masked fillers
        # (slot 0) the exact kernel's -2*BIG; exhausted tiles (best ==
        # sentinel) revert to the empty-slot marker.
        st = jnp.where(qb == 65535, 2.0 * _BIG, st)
        st = jnp.where(qb == 0, -2.0 * _BIG, st)
        empty = best == jnp.int32(-2147483648)
        tile_s.append(jnp.where(empty, -3.0e38, st))
        tile_i.append(jnp.where(empty, n_t, ic * tile_c + win_l))

    # Cross-tile merge: k exact sweeps over the [T, 2k] candidates.
    s_aug = jnp.concatenate([bs_ref[...]] + tile_s, axis=1)
    i_aug = jnp.concatenate([bi_ref[...]] + tile_i, axis=1)
    new_s, new_i = [], []
    for _ in range(k):
        best = jnp.max(s_aug, axis=1, keepdims=True)
        win = jnp.min(jnp.where(s_aug >= best, i_aug, n_t), axis=1,
                      keepdims=True)
        new_s.append(best)
        new_i.append(win)
        # Kill score AND index: a killed entry must never be re-picked
        # via a -3e38 tie (the duplicate-winner hazard the exact
        # kernel avoids by construction).
        killed = i_aug == win
        s_aug = jnp.where(killed, -3.0e38, s_aug)
        i_aug = jnp.where(killed, n_t, i_aug)
    bs_ref[...] = jnp.concatenate(new_s, axis=1)
    bi_ref[...] = jnp.concatenate(new_i, axis=1)

    @pl.when(ic == nc - 1)
    def _emit():
        idx_ref[...] = bi_ref[...]


@functools.partial(jax.jit, static_argnames=("k", "tile_q", "tile_c",
                                              "interpret", "quantized"))
def knn_topk_table(pos_q, pos_t, k: int, row_offset=0, point_mask=None,
                   tile_q: int = 256, tile_c: int = 2048,
                   interpret: bool = False, quantized: bool = False,
                   row_ids=None):
    """k-nearest table columns for each query row: ``pos_q [Nq, 3]``,
    ``pos_t [Nt, 3] -> idx [Nq, K]`` (global table indices, self —
    the column equal to ``row_offset + row`` — pinned to slot 0, ties
    to the lowest index, exact f32 scores). The unbatched, two-table
    analog of :func:`knn_topk` for point-sharded clouds: the column
    dimension is tiled with a running top-k in VMEM scratch, so
    nothing of the ``[Nq, Nt]`` score plane ever reaches HBM and
    memory stays O(tile_q * tile_c) regardless of table length.
    ``point_mask`` (``[Nt]`` bool) hides invalid table rows.
    ``quantized=True`` runs the ~1.5x faster packed-key sweeps whose
    ordering is exact at 16-bit per-tile score granularity
    (``_table_kernel_q``); ``False`` matches `geometry.knn`'s winner
    sets bit-for-bit. ``row_ids`` (``[Nq]`` int32) overrides the
    ``row_offset + arange`` self-column ids for non-contiguous query
    subsets (the bucketed kernel's repair pass)."""
    n_q = pos_q.shape[0]
    n_t = pos_t.shape[0]
    pad_q = (-n_q) % tile_q
    pad_c = (-n_t) % tile_c
    posq = jnp.pad(pos_q.astype(jnp.float32), ((0, pad_q), (0, 0)))
    sqq = jnp.sum(posq * posq, axis=-1, keepdims=True)  # [Nq, 1]
    if row_ids is None:
        rows = (jnp.asarray(row_offset, jnp.int32)
                + jnp.arange(n_q + pad_q, dtype=jnp.int32))[:, None]
    else:
        # Padded rows get id -1: never equal to any column.
        rows = jnp.pad(row_ids.astype(jnp.int32), (0, pad_q),
                       constant_values=-1)[:, None]
    post = jnp.swapaxes(pos_t, 0, 1).astype(jnp.float32)  # [3, Nt]
    post = jnp.pad(post, ((0, 0), (0, pad_c)))
    sqt = jnp.sum(post * post, axis=0, keepdims=True)  # [1, Nt+pad]
    mask = jnp.arange(n_t + pad_c) < n_t
    if point_mask is not None:
        mask = mask & jnp.pad(point_mask.astype(bool), (0, pad_c))
    maskf = mask.astype(jnp.float32)[None, :]

    nc = (n_t + pad_c) // tile_c
    kern = _table_kernel_q if quantized else _table_kernel
    idx = pl.pallas_call(
        functools.partial(kern, k=k, n_t=n_t, tile_c=tile_c,
                          nc=nc),
        grid=((n_q + pad_q) // tile_q, nc),
        in_specs=[
            pl.BlockSpec((tile_q, 1), lambda iq, ic: (iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 3), lambda iq, ic: (iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda iq, ic: (iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile_c), lambda iq, ic: (0, ic),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_c), lambda iq, ic: (0, ic),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_c), lambda iq, ic: (0, ic),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_q, k), lambda iq, ic: (iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_q + pad_q, k), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tile_q, k), jnp.float32),
            pltpu.VMEM((tile_q, k), jnp.int32),
        ],
        interpret=interpret,
    )(rows, posq, sqq, post, sqt, maskf)
    return idx[:n_q]


@functools.partial(jax.jit,
                   static_argnames=("k", "tile", "interpret", "quantized",
                                    "return_mean_dist"))
def knn_topk(pos, k: int, tile: int = 128, interpret: bool = False,
             quantized: bool = False, return_mean_dist: bool = False):
    """``pos [B, N, 3] -> idx [B, N, K]`` k-nearest (self in slot 0,
    ties to the lowest index). ``quantized=True`` runs the ~2x faster
    packed-key sweeps whose ordering is exact at bf16 score granularity
    (see ``_kernel_q``); ``False`` is exact in f32. No mask support —
    callers with ``point_mask`` use the XLA path.

    ``return_mean_dist=True`` additionally returns ``[B, N]`` f32 mean
    Euclidean distance to the k winners (self counted as 0) — the
    exact per-point value the Gaussian-weight bandwidth needs
    (grad_div_mls.py:100-116), recovered from the f32 score plane at
    ~zero extra cost (saves the fused operator build a position
    re-gather)."""
    b, n, _ = pos.shape
    if quantized and n > 65535:
        quantized = False  # column no longer fits the packed low bits
    pad = (-n) % tile
    pos_p = jnp.pad(pos.astype(jnp.float32), ((0, 0), (0, pad), (0, 0)))
    n_pad = n + pad
    post = jnp.swapaxes(pos, 1, 2).astype(jnp.float32)  # [B, 3, N]
    sq = jnp.sum(post * post, axis=1, keepdims=True)  # [B, 1, N]

    out_specs = [pl.BlockSpec((1, tile, k), lambda ib, it: (ib, it, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((b, n_pad, k), jnp.int32)]
    if return_mean_dist:
        out_specs.append(pl.BlockSpec((1, tile, 1),
                                      lambda ib, it: (ib, it, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, n_pad, 1), jnp.float32))

    outs = pl.pallas_call(
        functools.partial(_kernel_q if quantized else _kernel,
                          k=k, n=n, tile=tile,
                          mean_dist=return_mean_dist),
        grid=(b, n_pad // tile),
        in_specs=[
            pl.BlockSpec((1, tile, 3), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if return_mean_dist else out_specs[0],
        out_shape=out_shape if return_mean_dist else out_shape[0],
        interpret=interpret,
    )(pos_p, post, sq)
    if return_mean_dist:
        idx, md = outs
        return idx[:, :n], md[:, :n, 0]
    return outs[:, :n]
