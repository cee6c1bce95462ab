"""Fused MLS operator construction (Pallas).

Collapses the entire per-neighborhood pipeline of
``geometry.grad_div.build_grad_div`` — Gaussian weights, quadratic-
basis normal equations, unrolled 6x6 Cholesky solve, height-field
partials, inverse metric, tangent-vector mapping, div composition —
into ONE Pallas program over ``[T, K]`` VMEM tiles. The XLA version
lowers to ~150 small kernels whose launch overhead dominates on TPU;
here everything stays in registers/VMEM.

Inputs are cheap XLA elementwise precomputations over one gathered
``[B, N, K, 9]`` neighbor table (positions + frames):

  u, v     tangent coords (offset . x_basis / y_basis; exact since the
           bases are orthogonal to the normal)
  dist     Euclidean edge length
  patch    offset . normal (the height samples)
  d_*      frame dot products that make the basis transformation
           LINEAR in the fitted partials h_x, h_y:
           gamma_x . xb_j = xc.xb_j + h_x (nc.xb_j), etc.

Outputs per-edge grad/div coefficients (pre-normalization); the
per-cloud infinity-norm normalization is a cheap XLA epilogue that
scales grad and div by the same scalar (div is linear in grad).
Falls back to the XLA path off-TPU and when shape_regularizer is set.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry.grad_div import GradDiv
from .gather_rows import gather_rows

__all__ = ["build_grad_div_fused"]

_EPS = 1e-5


def _wls_math(planes, kernel_width, regularizer):
    """The full WLS pipeline as pure jnp over stacked edge planes.

    ``planes``: ``[12, ..., K, N']`` stacked (u, v, dist, patch, mask,
    d_xx, d_xy, d_yx, d_yy, d_nx, d_ny, avg-broadcast); reductions run
    over the SECOND-TO-LAST (K) axis, so points ride the TPU lane
    dimension (K=20 on lanes would waste 108 of 128). This same
    function serves as the Pallas kernel body (on ``[12, K, T]``
    tiles), the XLA fallback, and the backward rule.

    Returns ``(g, d)``: each ``[2, ..., K, N']``.
    """
    (u, v, dist, patch, mask, d_xx, d_xy, d_yx, d_yy, d_nx, d_ny,
     avg) = [planes[i] for i in range(12)]

    # 1. Normalized Gaussian weights (grad_div_mls.py:100-116 semantics).
    denom = jnp.maximum((kernel_width * avg) ** 2, 1e-20)
    w = jnp.exp(-(dist * dist) / denom) * mask
    w = w / jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), _EPS)

    # 2. Quadratic patch basis.
    one = jnp.ones_like(u)
    basis = [one, u, v, u * u, u * v, v * v]
    nb = 6

    # 3. Normal equations A = B^T W B + lam I (21 unique entries).
    A = [[None] * nb for _ in range(nb)]
    for i in range(nb):
        for j in range(i, nb):
            acc = jnp.sum(w * basis[i] * basis[j], axis=-2, keepdims=True)
            if i == j:
                acc = acc + regularizer
            A[i][j] = acc

    # 4. Unrolled Cholesky.
    L = [[None] * nb for _ in range(nb)]
    inv_d = [None] * nb
    for j in range(nb):
        sdiag = A[j][j]
        for t in range(j):
            sdiag = sdiag - L[j][t] * L[j][t]
        L[j][j] = jnp.sqrt(jnp.maximum(sdiag, 1e-20))
        inv_d[j] = 1.0 / L[j][j]
        for i in range(j + 1, nb):
            soff = A[j][i]
            for t in range(j):
                soff = soff - L[i][t] * L[j][t]
            L[i][j] = soff * inv_d[j]

    # 5. Solve A Z = (W B)^T: Z rows are per-edge wls coefficients.
    rhs = [w * bb for bb in basis]
    y = [None] * nb
    for i in range(nb):
        t = rhs[i]
        for kk in range(i):
            t = t - L[i][kk] * y[kk]
        y[i] = t * inv_d[i]
    z = [None] * nb
    for i in reversed(range(nb)):
        t = y[i]
        for kk in range(i + 1, nb):
            t = t - L[kk][i] * z[kk]
        z[i] = t * inv_d[i]

    g1, g2 = z[1], z[2]  # per-edge grad coefficients

    # 6. Height-field coefficients c_i = sum_k z_i patch.
    c = [jnp.sum(z[i] * patch, axis=-2, keepdims=True) for i in range(6)]
    h_x = c[1] + 2.0 * c[3] * u + c[4] * v
    h_y = c[2] + c[4] * u + 2.0 * c[5] * v

    # 7. Inverse first fundamental form (supplement eq. 9).
    det = 1.0 + h_x * h_x + h_y * h_y
    m11 = (1.0 + h_y * h_y) / det
    m12 = -(h_x * h_y) / det
    m22 = (1.0 + h_x * h_x) / det

    # 8. Basis transformation, linear in h (supplement eq. 15).
    bt11 = d_xx + h_x * d_nx
    bt12 = d_xy + h_x * d_ny
    bt21 = d_yx + h_y * d_nx
    bt22 = d_yy + h_y * d_ny

    # 9. Vector mapping M = inv_metric @ bt; div row = grad row @ M.
    M11 = m11 * bt11 + m12 * bt21
    M12 = m11 * bt12 + m12 * bt22
    M21 = m12 * bt11 + m22 * bt21
    M22 = m12 * bt12 + m22 * bt22

    d1 = g1 * M11 + g2 * M21
    d2 = g1 * M12 + g2 * M22

    return jnp.stack([g1, g2]), jnp.stack([d1, d2])


def _kernel(edges_ref, g_ref, d_ref, *, kernel_width, regularizer, k):
    """edges_ref: [1, 12, K, T]; outputs g/d: [1, 2, K, T]."""
    g, d = _wls_math(edges_ref[0], kernel_width, regularizer)
    g_ref[0] = g
    d_ref[0] = d


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _wls_pallas(edges, kernel_width, regularizer, tile, interpret=False):
    """Pallas forward over [B, 12, K, N] edges -> (g, d) [B, 2, K, N].

    Differentiable: the backward re-runs the identical jnp math
    (_wls_math) under jax.vjp — the fused kernel is a forward-only
    fast path, gradients w.r.t. positions/frames stay exact.
    """
    return _wls_pallas_fwd_impl(edges, kernel_width, regularizer, tile,
                                interpret)


def _wls_pallas_fwd_impl(edges, kernel_width, regularizer, tile,
                         interpret=False):
    b, _, k, n_pad = edges.shape
    return pl.pallas_call(
        functools.partial(_kernel, kernel_width=float(kernel_width),
                          regularizer=float(regularizer), k=k),
        grid=(b, n_pad // tile),
        in_specs=[
            pl.BlockSpec((1, 12, k, tile), lambda ib, it: (ib, 0, 0, it),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 2, k, tile), lambda ib, it: (ib, 0, 0, it),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, k, tile), lambda ib, it: (ib, 0, 0, it),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 2, k, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 2, k, n_pad), jnp.float32),
        ],
        interpret=interpret,
    )(edges)


def _wls_vjp_fwd(edges, kernel_width, regularizer, tile, interpret=False):
    out = _wls_pallas_fwd_impl(edges, kernel_width, regularizer, tile,
                               interpret)
    return out, edges


def _bwd_kernel(edges_ref, ctg_ref, ctd_ref, de_ref, *, kernel_width,
                regularizer, k):
    """VJP of the WLS math per tile, in VMEM. Differentiating the
    unrolled 6x6 Cholesky in XLA explodes into hundreds of small
    HBM-bound kernels (~120 ms for the whole build's backward at
    B=32, N=1024); tracing jax.vjp of the SAME _wls_math inside the
    Pallas body keeps every intermediate in registers/VMEM."""
    _, vjp = jax.vjp(
        lambda e: _wls_math(e, kernel_width, regularizer), edges_ref[0]
    )
    (de,) = vjp((ctg_ref[0], ctd_ref[0]))
    de_ref[0] = de


def _wls_bwd_pallas(edges, cts, kernel_width, regularizer, tile,
                    interpret):
    b, _, k, n_pad = edges.shape
    ctg, ctd = cts
    spec_e = pl.BlockSpec((1, 12, k, tile), lambda ib, it: (ib, 0, 0, it),
                          memory_space=pltpu.VMEM)
    spec_c = pl.BlockSpec((1, 2, k, tile), lambda ib, it: (ib, 0, 0, it),
                          memory_space=pltpu.VMEM)
    de = pl.pallas_call(
        functools.partial(_bwd_kernel, kernel_width=float(kernel_width),
                          regularizer=float(regularizer), k=k),
        grid=(b, n_pad // tile),
        in_specs=[spec_e, spec_c, spec_c],
        out_specs=spec_e,
        out_shape=jax.ShapeDtypeStruct((b, 12, k, n_pad), jnp.float32),
        interpret=interpret,
    )(edges, ctg, ctd)
    return (de,)


def _wls_vjp_bwd(kernel_width, regularizer, tile, interpret, edges, cts):
    if jax.default_backend() == "tpu" or interpret:
        return _wls_bwd_pallas(edges, cts, kernel_width, regularizer,
                               tile, interpret)

    def ref(e):
        g, d = _wls_math(jnp.moveaxis(e, 1, 0), kernel_width, regularizer)
        # [2, B, K, N] -> [B, 2, K, N]
        return jnp.moveaxis(g, 0, 1), jnp.moveaxis(d, 0, 1)

    _, vjp = jax.vjp(ref, edges)
    return vjp(cts)


_wls_pallas.defvjp(_wls_vjp_fwd, _wls_vjp_bwd)


def build_grad_div_fused(pos, normal, x_basis, y_basis, nbr_idx, nbr_mask,
                         kernel_width: float = 1.0,
                         regularizer: float = 0.001,
                         normalized: bool = True,
                         tile: int = 512,
                         interpret: bool = False,
                         avg=None) -> GradDiv:
    """Batched fused operator build: ``pos [B, N, 3]`` etc. -> GradDiv.

    Semantics match ``jax.vmap(geometry.grad_div.build_grad_div)``
    (without shape_regularizer); see the module docstring.

    ``avg``: optional precomputed per-cloud mean edge length ``[B]``
    (``knn_topk(..., return_mean_dist=True)`` recovers it for free
    from the kNN score plane), skipping this function's own
    reductions. Positions carry no requested gradients in training, so
    the provenance swap is exact for the parameter VJP.
    """
    n = pos.shape[1]
    pm = jnp.any(nbr_mask, axis=2).astype(jnp.float32)
    edges = _edge_planes_xla(pos, normal, x_basis, y_basis,
                             nbr_idx, nbr_mask, pm, avg, interpret)

    # Pad N (the lane axis) to the tile size.
    n_pad = n + ((-n) % tile)
    if n_pad != n:
        edges = jnp.pad(edges, ((0, 0), (0, 0), (0, 0), (0, n_pad - n)))

    g_coef, d_coef = _wls_pallas(edges, float(kernel_width),
                                 float(regularizer), tile, interpret)
    # [B, 2, K, N] -> [B, N, K, 2]
    g_coef = jnp.transpose(g_coef[..., :n], (0, 3, 2, 1))
    d_coef = jnp.transpose(d_coef[..., :n], (0, 3, 2, 1))

    if normalized:
        # Per-cloud infinity norm of grad; div scales identically
        # (it is the grad row composed with an orthogonal-ish map).
        sum_abs = jnp.sum(jnp.abs(g_coef), axis=2)  # [B, N, 2]
        row_norm = jnp.linalg.norm(sum_abs, axis=-1) * pm  # [B, N]
        inf_norm = jnp.max(row_norm, axis=1)  # [B]
        scale = jnp.where(inf_norm > 1e-5, 1.0 / inf_norm, 1.0)
        g_coef = g_coef * scale[:, None, None, None]
        d_coef = d_coef * scale[:, None, None, None]

    return GradDiv(nbr_idx=nbr_idx, nbr_mask=nbr_mask,
                   grad_coef=g_coef, div_coef=d_coef)


def _edge_planes_xla(pos, normal, x_basis, y_basis, nbr_idx, nbr_mask,
                     pm, avg, interpret):
    """Differentiable edge-plane construction (the training path):
    Pallas gather_rows + XLA elementwise plane math."""
    b, n, _ = pos.shape
    k = nbr_idx.shape[-1]
    em = nbr_mask.astype(jnp.float32)

    # One gather for the whole neighbor table — a Pallas one-hot
    # matmul (ops/gather_rows.py): XLA's native gather made this the
    # most expensive stage of the build (~9 GB/s on TPU).
    table = jnp.concatenate([pos, x_basis, y_basis], axis=-1)  # [B, N, 9]
    # Component-major gather [B, 16, K, N] (pad_cols): every
    # elementwise op below runs on [B, K, N] planes with points on the
    # 128 lanes. (Keeping the math on [B, K, N, 3] vectors puts the
    # 3-wide component axis on lanes — 2% VPU utilization, measured 3x
    # the cost of the gather itself; and gathering k-major
    # [B, K, N, C] forced two 0.45 ms XLA layout copies here.)
    comp = gather_rows(table, nbr_idx, 128, interpret, True)
    gx, gy, gz = comp[:, 0], comp[:, 1], comp[:, 2]  # neighbor pos
    xgx, xgy, xgz = comp[:, 3], comp[:, 4], comp[:, 5]  # neighbor xb
    ygx, ygy, ygz = comp[:, 6], comp[:, 7], comp[:, 8]  # neighbor yb

    def ctr(a):  # center-point components, broadcast over K
        return a[..., 0][:, None], a[..., 1][:, None], a[..., 2][:, None]

    px, py, pz = ctr(pos)
    nx, ny, nz = ctr(normal)
    xbx, xby, xbz = ctr(x_basis)
    ybx, yby, ybz = ctr(y_basis)

    ox, oy, oz = gx - px, gy - py, gz - pz  # edge offsets [B, K, N]
    sq = ox * ox + oy * oy + oz * oz
    # safe_norm semantics (geometry/utils.py): zero gradient at the
    # exactly-zero self-edge offset instead of NaN.
    positive = sq > 0
    dist = jnp.where(positive, jnp.sqrt(jnp.where(positive, sq, 1.0)), 0.0)
    patch = ox * nx + oy * ny + oz * nz
    u = ox * xbx + oy * xby + oz * xbz
    v = ox * ybx + oy * yby + oz * ybz

    emk = jnp.moveaxis(em, -1, 1)  # [B, K, N]

    if avg is None:
        # Per-cloud mean of per-point mean edge lengths.
        cnt = jnp.maximum(jnp.sum(emk, axis=1), 1.0)
        point_mean = jnp.sum(dist * emk, axis=1) / cnt  # [B, N]
        avg = jnp.sum(point_mean * pm, axis=1) / jnp.maximum(
            jnp.sum(pm, axis=1), 1.0
        )  # [B]

    # Planes stay [B, K, N] end to end: the WLS kernel reduces over K
    # on the sublane axis with points on lanes, so NO transpose sits
    # between the gather and the kernel.
    return jnp.stack([
        u, v, dist, patch, emk,
        xbx * xgx + xby * xgy + xbz * xgz,  # xb_i . xb_j
        xbx * ygx + xby * ygy + xbz * ygz,  # xb_i . yb_j
        ybx * xgx + yby * xgy + ybz * xgz,  # yb_i . xb_j
        ybx * ygx + yby * ygy + ybz * ygz,  # yb_i . yb_j
        nx * xgx + ny * xgy + nz * xgz,     # n_i . xb_j
        nx * ygx + ny * ygy + nz * ygz,     # n_i . yb_j
        jnp.broadcast_to(avg[:, None, None], (b, k, n)),
    ], axis=1)  # [B, 12, K, N]
