"""Gather+WLS in one kernel (eval fast path of the operator build).

Fuses the neighbor-table gather, tangent-plane edge math, Gaussian
weights, the unrolled 6x6 WLS Cholesky, and the vector mapping into
ONE Pallas program per point tile — the separate pipeline pays a
second one-hot build in ``gather_rows`` plus an HBM roundtrip of the
gathered ``[B, 16, K, N]`` table and the ``[B, 12, K, N]`` edge
planes between kernels. Dense assembly stays in the proven
``densify_coefs`` kernel (fusing it here was measured SLOWER: the
per-k lane-column coefficient broadcasts forced ~80 Mosaic relayouts
per tile).

Two further deviations from ``wls_fused.build_grad_div_fused``:

* the per-cloud infinity-norm normalization (grad_div_mls.py:258-260)
  is DEFERRED: outputs are unnormalized plus per-point row norms, and
  since ``(s*W) @ x == W @ (s*x)`` the scale rides on the operator
  inputs (:class:`geometry.dense.DenseGradDiv`) — no second pass over
  the coefficients;
* the per-cloud Gaussian bandwidth ``avg`` (mean edge length,
  grad_div_mls.py:100-116) is an input — ``ops.knn_topk`` recovers
  the exact per-point mean neighbor distances from its score plane
  for free, so no position re-gather is needed.

Forward-only: training routes through the differentiable
``wls_fused`` + ``densify_coefs`` pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wls_fused import _wls_math

__all__ = ["fused_gather_wls", "fused_dense_build"]

# NOTE (round 2): a gather+planes-ONLY kernel (emit the [12, K, T]
# plane block for the separate wide-tile wls kernel) was built and
# abandoned: the original concatenate-based variant HUNG the Mosaic
# compile, and the stack-based variant allocated 22.6 MB of scoped
# vmem even at B=2/N=256/K=8 (limit 16 MB) despite every live tensor
# being <1 MB. The differentiable gather_rows + XLA plane pipeline
# stays the only edge-plane path; expected win was only ~0.3 ms.


def _edge_planes(idx_ref, maskt_ref, hilo_ref, t0):
    """Shared gather + tangent-plane edge math: returns the first 11
    WLS input planes ``[11, K, T]`` (everything but the avg-bandwidth
    broadcast) plus ``(dist, emk)`` for bandwidth reductions.

    Component-major gather via TRANSPOSED one-hot contractions: per
    slot, ohT[m, e] = [idx[e] == m] and hilo^T @ ohT lands [32, T]
    directly with points on the lanes — no [K*T, 16] -> [16, K, T]
    relayout, and the one-hot lives one slot at a time (VMEM stays
    flat in N).
    """
    t = idx_ref.shape[1]
    k = idx_ref.shape[2]
    n = hilo_ref.shape[1]
    c = hilo_ref.shape[2] // 2
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (n, t), 0)
    idx = idx_ref[0]  # [T, K]
    own_t = hilo_ref[0, pl.ds(t0, t), :].T.astype(jnp.float32)  # [32,T]
    parts = [own_t[:c] + own_t[c:]]  # self slot: own rows
    for kk in range(1, k):
        oht = (idx[:, kk][None, :] == row_iota).astype(jnp.bfloat16)
        g2 = jax.lax.dot_general(
            hilo_ref[0], oht, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [32, T]
        parts.append(g2[:c] + g2[c:])
    comp = jnp.stack(parts, axis=1)  # [16, K, T]: points on lanes

    # Table layout: pos 0:3, x_basis 3:6, y_basis 6:9, normal 9:12.
    gx, gy, gz = comp[0], comp[1], comp[2]
    xgx, xgy, xgz = comp[3], comp[4], comp[5]
    ygx, ygy, ygz = comp[6], comp[7], comp[8]

    def ctr(i):
        return comp[i, 0][None, :]  # center value, broadcast over K

    px, py, pz = ctr(0), ctr(1), ctr(2)
    xbx, xby, xbz = ctr(3), ctr(4), ctr(5)
    ybx, yby, ybz = ctr(6), ctr(7), ctr(8)
    nx, ny, nz = ctr(9), ctr(10), ctr(11)

    ox, oy, oz = gx - px, gy - py, gz - pz  # [K, T]
    sq = ox * ox + oy * oy + oz * oz
    positive = sq > 0
    dist = jnp.where(positive, jnp.sqrt(jnp.where(positive, sq, 1.0)),
                     0.0)
    patch = ox * nx + oy * ny + oz * nz
    u = ox * xbx + oy * xby + oz * xbz
    v = ox * ybx + oy * yby + oz * ybz
    emk = maskt_ref[0].astype(jnp.float32)  # [K, T]

    planes11 = [
        u, v, dist, patch, emk,
        xbx * xgx + xby * xgy + xbz * xgz,
        xbx * ygx + xby * ygy + xbz * ygz,
        ybx * xgx + yby * xgy + ybz * xgz,
        ybx * ygx + yby * ygy + ybz * ygz,
        nx * xgx + ny * xgy + nz * xgz,
        nx * ygx + ny * ygy + nz * ygz,
    ]  # 11 x [K, T]
    return planes11, dist, emk


def _kernel(avg_ref, idx_ref, maskt_ref, hilo_ref, gc_ref, dc_ref,
            rn_ref, *, k, n, kernel_width, regularizer):
    t = idx_ref.shape[1]
    t0 = pl.program_id(1) * t
    planes11, _, _ = _edge_planes(idx_ref, maskt_ref, hilo_ref, t0)
    avg = avg_ref[pl.program_id(0)]  # scalar-prefetch: [B] in SMEM
    planes = jnp.stack(planes11 + [jnp.full((k, t), avg, jnp.float32)])

    g, d = _wls_math(planes, kernel_width, regularizer)  # [2, K, T] x2

    # Per-point row norms for the deferred infinity-norm epilogue.
    sa1 = jnp.sum(jnp.abs(g[0]), axis=0, keepdims=True)  # [1, T]
    sa2 = jnp.sum(jnp.abs(g[1]), axis=0, keepdims=True)
    rn_ref[0] = jnp.sqrt(sa1 * sa1 + sa2 * sa2)

    # Point-major coefficient output (one small [K, T] -> [T, K]
    # transpose per plane) — feeds densify_coefs blocks directly.
    gc_ref[0, 0] = g[0].T
    gc_ref[0, 1] = g[1].T
    dc_ref[0, 0] = d[0].T
    dc_ref[0, 1] = d[1].T


def fused_gather_wls(pos, normal, x_basis, y_basis, idx, mask, avg,
                     kernel_width: float = 1.0,
                     regularizer: float = 0.001,
                     tile: int = 128, interpret: bool = False):
    """``pos/normal/x_basis/y_basis [B, N, 3], idx/mask [B, N, K],
    avg [B]`` -> ``(grad_coef [B, 2, N, K] f32, div_coef, row_norm
    [B, N] f32)``, UNNORMALIZED (see module docstring).

    Requires ``N % tile == 0`` and self-in-slot-0 neighbor lists.
    ``coef[:, d]`` are the per-edge operator rows of
    ``wls_fused.build_grad_div_fused(..., normalized=False)``.
    """
    b, n, _ = pos.shape
    k = idx.shape[-1]
    if n % tile != 0:
        raise ValueError(f"fused_gather_wls needs N % {tile} == 0")

    table = jnp.concatenate([pos, x_basis, y_basis, normal], axis=-1)
    c = 16
    tf = jnp.pad(table.astype(jnp.float32), ((0, 0), (0, 0), (0, 4)))
    hi = jax.lax.optimization_barrier(tf.astype(jnp.bfloat16))
    lo = (tf - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    hilo = jnp.concatenate([hi, lo], axis=-1)  # [B, N, 32]

    idx_i = idx.astype(jnp.int32)
    maskt = jnp.swapaxes(mask, 1, 2).astype(jnp.int32)  # [B, K, N]
    avg1 = avg.reshape(b).astype(jnp.float32)

    coef_spec = pl.BlockSpec((1, 2, tile, k),
                             lambda ib, it, *_: (ib, 0, it, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n // tile),
        in_specs=[
            pl.BlockSpec((1, tile, k), lambda ib, it, *_: (ib, it, 0)),
            pl.BlockSpec((1, k, tile), lambda ib, it, *_: (ib, 0, it)),
            pl.BlockSpec((1, n, 2 * c), lambda ib, it, *_: (ib, 0, 0)),
        ],
        out_specs=[
            coef_spec, coef_spec,
            pl.BlockSpec((1, 1, tile), lambda ib, it, *_: (ib, 0, it)),
        ],
    )
    gc, dc, rn = pl.pallas_call(
        functools.partial(_kernel, k=k, n=n,
                          kernel_width=float(kernel_width),
                          regularizer=float(regularizer)),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, 2, n, k), jnp.float32),
            jax.ShapeDtypeStruct((b, 2, n, k), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
        ],
        interpret=interpret,
    )(avg1, idx_i, maskt, hilo)
    return gc, dc, rn[:, 0]


def fused_dense_build(pos, normal, x_basis, y_basis, idx, mask, avg,
                      kernel_width: float = 1.0,
                      regularizer: float = 0.001,
                      interpret: bool = False):
    """Full eval-path dense build: :func:`fused_gather_wls` followed by
    the ``densify_coefs`` assembly kernel. Returns ``(w_grad
    [B, 2, N, N] bf16, w_div, row_norm [B, N] f32)``, unnormalized."""
    from .densify_op import densify_coef_planes

    n = pos.shape[1]
    # 512-wide tiles hang the Mosaic compile of the per-slot
    # dot_general loop; 128 is the proven configuration.
    wls_tile = 128 if n % 128 == 0 else n
    gc, dc, rn = fused_gather_wls(pos, normal, x_basis, y_basis, idx,
                                  mask, avg, kernel_width, regularizer,
                                  wls_tile, interpret)
    wg, wd = densify_coef_planes(
        idx.astype(jnp.int32), gc[:, 0], gc[:, 1], dc[:, 0], dc[:, 1],
        "bfloat16", 128 if n <= 2048 else 64, interpret)
    return wg, wd, rn
