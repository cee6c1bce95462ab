"""Fused neighbor-gather + masked max (the scalar-stream aggregation).

Computes ``out[b, n, c] = max over valid k of h[b, idx[b, n, k], c]``
without materializing the ``[B, N, K, C]`` gathered tensor:

* forward: a Pallas kernel holds the whole per-cloud feature table
  ``[N, C]`` in VMEM and performs K one-hot ``[T, N] @ [N, C]`` matmuls
  per point tile, tracking the running max and the winning slot — MXU
  work instead of an XLA gather (which measures ~9 GB/s on TPU).
* backward: single-winner routing (torch scatter_max semantics,
  deterministic under SPMD). The cotangent is scattered to
  ``idx[b, n, winner]`` rows via a Pallas transpose kernel that
  re-derives the routing by comparing winner indices against the
  output-row iota — again compares + reductions, no scatter op.

A pure-XLA reference path (`_reference_fwd`) runs on CPU backends and
anchors the tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gather_max", "gather_minmax", "gather_matmul_minmax",
           "masked_nbr_max", "int8_quantize", "gather_max_int8",
           "gather_matmul_max_int8", "gather_max_affine"]

_NEG = -3.0e38  # ~ -inf in f32, safe to negate/compare


def _pad_to(x, multiple, axis, value=0):
    pad = (-x.shape[axis]) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def fit_tile(tile, per_t_bytes, fixed_bytes=0, budget=10 * 2**20,
             floor=32):
    """Shrinks a point-tile until the kernel's VMEM working set fits
    the ~16 MB scoped budget (with headroom). The one-hot is the
    dominant term ([K*T, N] bf16): e.g. K=30, N=2048, C=128 blows VMEM
    at T=128 (observed 17 MB > 16 MB compile failure)."""
    while tile > floor and fixed_bytes + tile * per_t_bytes > budget:
        tile //= 2
    return tile


def split_hilo(h, axis=-1):
    """(packed_table, paired): f32 features are split h = hi + lo and
    lane-packed as [..., 2C] along ``axis`` for an exact gather; bf16
    features are already exactly representable, so the kernels run a
    single pass at half the FLOPs (the mixed-precision path).

    The barrier placement is load-bearing and this helper is the ONE
    place that owns the idiom (the backward wrappers of gather_rows/
    gather_sum and _pallas_bwd_mm all route through it): without the
    barrier the compiler's excess-precision simplifier cancels
    f32(bf16(h)) -> h under jit — in XLA lowering AND in interpret-mode
    Pallas — folding lo to zero and silently degrading the two-pass
    contraction to single-pass bf16 (observed: 2e-3 rel error at
    C >= 128 while eager stayed exact; the TPU gradient tests pin it).
    """
    if h.dtype == jnp.bfloat16:
        return h, False
    hf = h.astype(jnp.float32)
    hi = jax.lax.optimization_barrier(hf.astype(jnp.bfloat16))
    lo = (hf - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, lo], axis=axis), True


# -- forward kernel ------------------------------------------------------


def build_onehot(idx_ref, t, n, k, k0=0, dtype=jnp.bfloat16):
    """k-major one-hot [(K-k0)*T, N] for slots ``k0..k-1``.
    Compares stay int32: Mosaic on v5e rejects sub-32-bit vector
    compares ("Target does not support this comparison" for
    vector<...xi16>). ``k0=1`` skips the self slot (callers that
    guarantee self-in-slot-0 read their own rows directly — one fewer
    [T, N] compare+select pass per tile). ``dtype=int8`` (quantized
    gathers) routes through an int32 select before converting —
    sub-32-bit vector selects crash Mosaic on v5e."""
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (t, n), 1)
    idx = idx_ref[0]  # [T, K]
    if dtype == jnp.int8:
        ones = [
            jnp.where(idx[:, kk][:, None] == col_iota, 1, 0)
            .astype(jnp.int8)
            for kk in range(k0, k)
        ]
    else:
        ones = [
            (idx[:, kk][:, None] == col_iota).astype(dtype)
            for kk in range(k0, k)
        ]
    return jnp.concatenate(ones, axis=0)


def _self_rows(table_ref, t):
    """The tile's own rows of the (whole-cloud) feature table: the
    exact gather of the self slot when ``idx[i, 0] == i``."""
    t0 = pl.program_id(1) * t
    return table_ref[0, pl.ds(t0, t), :]


def _minmax_kernel(idx_ref, mask_ref, hilo_ref, mx_ref, mn_ref,
                   *wrefs, k, n, paired, winners, self0=False):
    """Same one-hot matmul as ``_fwd_kernel`` but tracks BOTH the max
    and the min in one pass — the centralized DeltaConv fast path
    needs both extremes (negative BatchNorm scales flip the monotone
    nonlinearity, see nn/deltaconv.py). Winner slots (for the VJP) are
    computed only when ``winners`` — the primal/eval path skips the
    two extra select chains. ``self0`` reads slot 0 directly."""
    t = idx_ref.shape[1]
    c = hilo_ref.shape[2] // (2 if paired else 1)
    k0 = 1 if self0 else 0
    onehot = build_onehot(idx_ref, t, n, k, k0)
    both = jnp.dot(onehot, hilo_ref[0],
                   preferred_element_type=jnp.float32)
    val = both[:, :c] + both[:, c:] if paired else both
    best = jnp.full((t, c), _NEG, jnp.float32)
    worst = jnp.full((t, c), -_NEG, jnp.float32)
    wbest = jnp.zeros((t, c), jnp.int32)
    wworst = jnp.zeros((t, c), jnp.int32)
    for kk in range(k):
        if self0 and kk == 0:
            srows = _self_rows(hilo_ref, t).astype(jnp.float32)
            vk = srows[:, :c] + srows[:, c:] if paired else srows
        else:
            i0 = (kk - k0) * t
            vk = val[i0:i0 + t, :]
        ok = mask_ref[0, :, kk][:, None] > 0
        vmax = jnp.where(ok, vk, _NEG)
        vmin = jnp.where(ok, vk, -_NEG)
        if winners:
            up = vmax > best
            wbest = jnp.where(up, kk, wbest)
            best = jnp.where(up, vmax, best)
            dn = vmin < worst
            wworst = jnp.where(dn, kk, wworst)
            worst = jnp.where(dn, vmin, worst)
        else:
            best = jnp.maximum(best, vmax)
            worst = jnp.minimum(worst, vmin)
    mx_ref[0] = best.astype(mx_ref.dtype)
    mn_ref[0] = worst.astype(mn_ref.dtype)
    if winners:
        wrefs[0][0] = wbest
        wrefs[1][0] = wworst


def _fwd_kernel(idx_ref, mask_ref, hilo_ref, out_ref, *wrefs,
                k, n, paired, winners, self0=False):
    """One k-major one-hot [K*T, N] feeding ONE bf16 MXU pass.

    The feature table is pre-split h = hi + lo with hi = bf16(h),
    lo = bf16(h - hi), packed on the LANE axis as [N, 2C]; one-hot
    entries are exact in bf16, so summing the two column halves of the
    f32-accumulated product reconstructs the gather exactly (~1e-6
    relative vs 2e-3 for a single bf16 pass). The split MUST be
    guarded by lax.optimization_barrier at the caller: XLA's
    excess-precision pass cancels f32(bf16(h)) -> h and folds lo to
    zero otherwise. Winner slots are computed only when ``winners``
    (the VJP path); the primal/eval path runs a plain max chain.
    """
    t = idx_ref.shape[1]
    c = hilo_ref.shape[2] // (2 if paired else 1)
    k0 = 1 if self0 else 0
    onehot = build_onehot(idx_ref, t, n, k, k0)
    both = jnp.dot(onehot, hilo_ref[0],
                   preferred_element_type=jnp.float32)
    val = both[:, :c] + both[:, c:] if paired else both
    # Static unrolled max/argmax over the K row-blocks (Mosaic handles
    # sliced sublane reads better than leading-axis reductions).
    best = jnp.full((t, c), _NEG, jnp.float32)
    winner = jnp.zeros((t, c), jnp.int32)
    for kk in range(k):
        if self0 and kk == 0:
            srows = _self_rows(hilo_ref, t).astype(jnp.float32)
            vk = srows[:, :c] + srows[:, c:] if paired else srows
        else:
            i0 = (kk - k0) * t
            vk = val[i0:i0 + t, :]
        vk = jnp.where(mask_ref[0, :, kk][:, None] > 0, vk, _NEG)
        if winners:
            upd = vk > best
            winner = jnp.where(upd, kk, winner)
            best = jnp.where(upd, vk, best)
        else:
            best = jnp.maximum(best, vk)
    out_ref[0] = best.astype(out_ref.dtype)
    if winners:
        wrefs[0][0] = winner


def _pallas_fwd(h, idx, mask, tile=128, interpret=False, winners=True,
                self0=False):
    b, n, c = h.shape
    k = idx.shape[-1]
    # onehot [K*T, N] bf16 + product [K*T, 2C] f32 dominate VMEM.
    tile = fit_tile(tile, k * (2 * n + 12 * c))
    idx_p = _pad_to(idx.astype(jnp.int32), tile, 1)
    mask_p = _pad_to(mask.astype(jnp.int32), tile, 1)
    n_pad = idx_p.shape[1]
    # Self-row reads address table rows [t0, t0+tile); only safe when
    # no padded tiles exist. Winner tracking composes: the kk=0 slot
    # reads its own rows and records winner 0 like any other slot.
    self0 = self0 and n_pad == n

    hilo, paired = split_hilo(h)
    cw = 2 * c if paired else c
    # bf16 inputs write bf16 outputs in BOTH the eval and the VJP
    # forward (the max of bf16 values is itself bf16-representable, so
    # this is lossless): halves the output HBM traffic, keeps the
    # primal and custom_vjp-forward output avals identical, and lets
    # bf16 cotangents actually reach the half-width backward pass.
    out_dt = h.dtype if h.dtype == jnp.bfloat16 else jnp.float32

    grid = (b, n_pad // tile)
    spec_o = pl.BlockSpec((1, tile, c), lambda ib, it: (ib, it, 0),
                          memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, k=k, n=n, paired=paired,
                          winners=winners, self0=self0),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, k), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, k), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, cw), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[spec_o] * (2 if winners else 1),
        out_shape=[jax.ShapeDtypeStruct((b, n_pad, c), out_dt)] + (
            [jax.ShapeDtypeStruct((b, n_pad, c), jnp.int32)]
            if winners else []),
        interpret=interpret,
    )(idx_p, mask_p, hilo)
    if winners:
        return outs[0][:, :n], outs[1][:, :n]
    return outs[0][:, :n], None


# -- backward kernel -----------------------------------------------------


def _bwd_mm_kernel(idx_ref, win1_ref, g1_ref, win2_ref, g2_ref, dh_ref,
                   *, k, n, two, paired, self0=False):
    """Winner-routed scatter as ONE transposed one-hot matmul.

    G[kk*T + t, :] = [win1[t] == kk] * g1[t] (+ the same for the
    second winner map when ``two``), then dh += onehot^T @ [Ghi|Glo]
    — the row-loop VPU version costs O(N^2 C) selects; this is MXU
    work with the same one-hot the forward builds. When ``paired`` the
    output keeps hi/lo column halves and the caller sums them (exact
    routing of f32 cotangents); bf16 pipelines pass cotangents that
    are ALREADY bf16 — there ``lo == 0`` identically, so a single
    half-width pass is exact and halves the dominant MXU contraction
    (measured 4.0 -> 2.0 ms on the 256-channel layer's backward).

    ``self0`` (kNN self-loop promise, unpadded square tiles only):
    slot-0 cotangents route to the tile's OWN rows via a direct
    dynamic-slice accumulate — one fewer [T, N] compare pass and T
    fewer contraction rows per tile."""
    t = idx_ref.shape[1]
    k0 = 1 if self0 else 0
    onehot = build_onehot(idx_ref, t, n, k, k0)  # [(K-k0)*T, N]

    # Cotangent blocks arrive bf16 — PRE-SPLIT [T, 2C] hi/lo when
    # ``paired`` (split_hilo in _pallas_bwd_mm; splitting in-kernel is
    # unsafe — the compiler cancels g - f32(bf16(g)) to zero under
    # XLA/interpret lowering, silently degrading f32 cotangent routing
    # to single-bf16). The winner map is widened ONCE per entry so the
    # per-k compare runs at the cotangent's width.
    #
    # One contraction per winner map (summing the two maps' bf16
    # halves before the dot would round; the extra dot is exact and
    # two=True is off the training hot path).
    entries = [(win1_ref, g1_ref)] + ([(win2_ref, g2_ref)] if two else [])
    acc = None
    self_acc = None
    for win_ref, g_ref_ in entries:
        w = win_ref[0]
        if paired:
            w = jnp.concatenate([w, w], axis=-1)
        g = g_ref_[0]
        gcat = jnp.concatenate(
            [jnp.where(w == kk, g, jnp.zeros_like(g))
             for kk in range(k0, k)],
            axis=0)  # [(K-k0)*T, 2C|C] bf16
        part = jax.lax.dot_general(
            onehot, gcat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [N, 2C|C]
        acc = part if acc is None else acc + part
        if self0:
            sp = jnp.where(w == 0, g, jnp.zeros_like(g)).astype(
                jnp.float32)
            self_acc = sp if self_acc is None else self_acc + sp

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dh_ref[0] = jnp.zeros_like(dh_ref[0])

    dh_ref[0] += acc
    if self0:
        t0 = pl.program_id(1) * t
        dh_ref[0, pl.ds(t0, t), :] += self_acc


def _pallas_bwd_mm(idx, winners_and_gs, n_out, tile=128, self0=False):
    """winners_and_gs: [(winner [B,N,C] int32 k-slots, g [B,N,C])]
    with one or two entries; returns dh [B, n_out, C] f32. ``self0``
    routes slot-0 cotangents by direct addressing (kNN self-loop
    promise; auto-disabled for padded/non-square shapes)."""
    b, n, c = winners_and_gs[0][1].shape
    k = idx.shape[-1]
    # bf16 cotangents are exactly representable -> single half-width
    # pass (see _bwd_mm_kernel). The two=True pair shares a dtype.
    paired = any(g.dtype != jnp.bfloat16 for _, g in winners_and_gs)
    cw = 2 * c if paired else c
    # onehot [K*T, N] bf16 + masked cotangents [K*T, C] +
    # lane-packed [K*T, CW] bf16; the [N, CW] f32 accumulator is
    # tile-independent.
    tile = fit_tile(tile, k * (2 * n + 12 * c),
                    fixed_bytes=n_out * 4 * cw)
    idx_p = _pad_to(idx.astype(jnp.int32), tile, 1)
    n_pad = idx_p.shape[1]
    self0 = self0 and n_pad == n and n == n_out
    two = len(winners_and_gs) == 2
    args = [idx_p]
    for w, g in winners_and_gs:
        # Padded rows: winner slot 0 with g = 0 contributes nothing.
        args.append(_pad_to(w.astype(jnp.int32), tile, 1))
        gp = _pad_to(g.astype(jnp.float32), tile, 1)
        if paired:
            # Exact hi/lo split OUTSIDE the kernel (split_hilo owns the
            # barrier idiom; see _bwd_mm_kernel's masked()).
            gp, _ = split_hilo(gp)  # [B, N_pad, 2C]
        else:
            gp = gp.astype(jnp.bfloat16)  # exact: g was bf16 already
        args.append(gp)
    if not two:
        args.append(args[1])  # dummy refs, ignored when two=False
        args.append(args[2])

    spec_idx = pl.BlockSpec((1, tile, k), lambda ib, it: (ib, it, 0),
                            memory_space=pltpu.VMEM)
    spec_nc = pl.BlockSpec((1, tile, c), lambda ib, it: (ib, it, 0),
                           memory_space=pltpu.VMEM)
    spec_ncw = pl.BlockSpec((1, tile, cw), lambda ib, it: (ib, it, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_bwd_mm_kernel, k=k, n=n_out, two=two,
                          paired=paired, self0=self0),
        grid=(b, n_pad // tile),
        in_specs=[spec_idx, spec_nc, spec_ncw, spec_nc, spec_ncw],
        out_specs=pl.BlockSpec((1, n_out, cw), lambda ib, it: (ib, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_out, cw), jnp.float32),
    )(*args)
    return out[..., :c] + out[..., c:] if paired else out


# -- reference (CPU / testing) path --------------------------------------


def _reference_fwd(h, idx, mask):
    gathered = jax.vmap(lambda a, i: a[i])(h, idx)  # [B, N, K, C]
    masked = jnp.where(mask[..., None], gathered.astype(jnp.float32), _NEG)
    winner = jnp.argmax(masked, axis=-2).astype(jnp.int32)
    out = jnp.max(masked, axis=-2)
    if h.dtype == jnp.bfloat16:  # aval parity with the TPU kernels
        out = out.astype(h.dtype)
    return out, winner


def _win_to_idx(idx, winner):
    """win_idx[b, n, c] = idx[b, n, winner[b, n, c]] via K elementwise
    passes (channel-dependent gather over the tiny K axis)."""
    k = idx.shape[-1]
    out = jnp.zeros(winner.shape, jnp.int32)
    for kk in range(k):
        out = jnp.where(winner == kk, idx[..., kk][..., None], out)
    return out


# -- public op ------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def gather_max(h, idx, mask, self_slot0=False):
    """``[B, N, C], [B, N, K], [B, N, K] -> [B, N, C]`` masked neighbor
    max with single-winner gradients. Rows with no valid neighbor
    return ``-3e38`` (callers mask them). ``self_slot0`` promises
    ``idx[..., 0] == arange(N)`` (the kNN self-loop convention) — the
    eval kernel then reads its own rows instead of comparing slot 0."""
    # Primal (non-differentiated) path: skip winner tracking — the
    # select chains cost ~2x the plain max chain on the VPU.
    out, _ = _fwd(h, idx, mask, winners=False, self0=self_slot0)
    return out


def _fwd(h, idx, mask, winners=True, self0=False):
    if jax.default_backend() == "tpu":
        return _pallas_fwd(h, idx, mask, winners=winners, self0=self0)
    return _reference_fwd(h, idx, mask)


def _gather_max_fwd(h, idx, mask, self_slot0):
    out, winner = _fwd(h, idx, mask, self0=self_slot0)
    # Residuals keep the K-SLOT winner (not the resolved point index):
    # the matmul backward routes by slot, and resolving indices cost a
    # K-pass select over [B, N, C] per layer.
    return out, (idx, winner, h.shape[1], jnp.zeros((0,), h.dtype))


def _gather_max_bwd(self_slot0, res, g):
    idx, winner, n_out, dtype_carrier = res
    h_dtype = dtype_carrier.dtype
    if jax.default_backend() == "tpu":
        # g keeps its dtype: bf16 cotangents take the exact
        # half-width backward pass (see _bwd_mm_kernel); slot-0
        # cotangents route by direct addressing under the kNN
        # self-loop promise.
        dh = _pallas_bwd_mm(idx, [(winner, g)], n_out,
                            self0=self_slot0)
    else:
        g = g.astype(jnp.float32)
        win_idx = _win_to_idx(idx, winner)
        b, n, c = g.shape
        dh = jnp.zeros((b, n_out, c), jnp.float32)
        bidx = jnp.arange(b)[:, None, None]
        cidx = jnp.arange(c)[None, None, :]
        dh = dh.at[bidx, win_idx, cidx].add(g)
    return dh.astype(h_dtype), None, None


gather_max.defvjp(_gather_max_fwd, _gather_max_bwd)


def _pallas_minmax(h, idx, mask, tile=128, interpret=False,
                   winners=True, self0=False):
    b, n, c = h.shape
    k = idx.shape[-1]
    tile = fit_tile(tile, k * (2 * n + 12 * c))
    idx_p = _pad_to(idx.astype(jnp.int32), tile, 1)
    mask_p = _pad_to(mask.astype(jnp.int32), tile, 1)
    n_pad = idx_p.shape[1]
    self0 = self0 and n_pad == n and not winners

    hilo, paired = split_hilo(h)
    cw = 2 * c if paired else c
    # bf16 in -> bf16 out in both eval and VJP forwards (see
    # _pallas_fwd: lossless, aval-consistent, enables the half-width
    # backward).
    out_dt = h.dtype if h.dtype == jnp.bfloat16 else jnp.float32

    spec_t = pl.BlockSpec((1, tile, k), lambda ib, it: (ib, it, 0),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((1, tile, c), lambda ib, it: (ib, it, 0),
                          memory_space=pltpu.VMEM)
    fdt = jax.ShapeDtypeStruct((b, n_pad, c), out_dt)
    i32 = jax.ShapeDtypeStruct((b, n_pad, c), jnp.int32)
    outs = pl.pallas_call(
        functools.partial(_minmax_kernel, k=k, n=n, paired=paired,
                          winners=winners, self0=self0),
        grid=(b, n_pad // tile),
        in_specs=[spec_t, spec_t,
                  pl.BlockSpec((1, n, cw), lambda ib, it: (ib, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[spec_o] * (4 if winners else 2),
        out_shape=[fdt, fdt] + ([i32, i32] if winners else []),
        interpret=interpret,
    )(idx_p, mask_p, hilo)
    outs = tuple(o[:, :n] for o in outs)
    return outs if winners else outs + (None, None)


def _reference_minmax(h, idx, mask):
    gathered = jax.vmap(lambda a, i: a[i])(h, idx).astype(jnp.float32)
    mx = jnp.where(mask[..., None], gathered, _NEG)
    mn = jnp.where(mask[..., None], gathered, -_NEG)
    omx, omn = jnp.max(mx, axis=-2), jnp.min(mn, axis=-2)
    if h.dtype == jnp.bfloat16:  # aval parity with the TPU kernels
        omx, omn = omx.astype(h.dtype), omn.astype(h.dtype)
    return (omx, omn,
            jnp.argmax(mx, axis=-2).astype(jnp.int32),
            jnp.argmin(mn, axis=-2).astype(jnp.int32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gather_minmax(h, idx, mask, interpret=False, self_slot0=False):
    """``[B, N, C], [B, N, K], [B, N, K] -> (max, min)`` over valid
    neighbors in ONE fused pass, single-winner gradients for each.
    Rows with no valid neighbor return ``(-3e38, 3e38)``."""
    out = _minmax_fwd_dispatch(h, idx, mask, interpret, winners=False,
                               self0=self_slot0)
    return out[0], out[1]


def _minmax_fwd_dispatch(h, idx, mask, interpret, winners=True,
                         self0=False):
    if jax.default_backend() == "tpu" or interpret:
        return _pallas_minmax(h, idx, mask, interpret=interpret,
                              winners=winners, self0=self0)
    return _reference_minmax(h, idx, mask)


def _gather_minmax_fwd(h, idx, mask, interpret, self_slot0):
    mx, mn, wmx, wmn = _minmax_fwd_dispatch(h, idx, mask, interpret)
    res = (idx, wmx, wmn, h.shape[1], jnp.zeros((0,), h.dtype))
    return (mx, mn), res


def _gather_minmax_bwd(interpret, self_slot0, res, cts):
    idx, wmx, wmn, n_out, dtype_carrier = res
    gmx, gmn = cts
    if jax.default_backend() == "tpu" and not interpret:
        # Both winner maps route through ONE transposed matmul; bf16
        # cotangents keep the exact half-width pass.
        dh = _pallas_bwd_mm(idx, [(wmx, gmx), (wmn, gmn)], n_out)
    else:
        gmx = gmx.astype(jnp.float32)
        gmn = gmn.astype(jnp.float32)
        dh = _route_cotangent(_win_to_idx(idx, wmx), gmx, n_out)
        dh = dh + _route_cotangent(_win_to_idx(idx, wmn), gmn, n_out)
    return dh.astype(dtype_carrier.dtype), None, None


def _route_cotangent(win_idx, g, n_out):
    b, n, c = g.shape
    dh = jnp.zeros((b, n_out, c), jnp.float32)
    bidx = jnp.arange(b)[:, None, None]
    cidx = jnp.arange(c)[None, None, :]
    return dh.at[bidx, win_idx, cidx].add(g)


gather_minmax.defvjp(_gather_minmax_fwd, _gather_minmax_bwd)


def _mm_minmax_kernel(idx_ref, mask_ref, x_ref, w_ref, mx_ref, mn_ref,
                      *, k, n, self0=False):
    """Gather-then-matmul min/max: one-hot gathers the INPUT features
    (width C_in) and applies the layer kernel on the gathered block in
    VMEM, so the expensive [K*T, N] one-hot contraction runs at C_in
    lanes instead of C_out — 1.6x fewer MACs for the reference's last
    conv (128 -> 256). Exact: (x @ W)[idx] == x[idx] @ W operand-for-
    operand (bf16 inputs, f32 accumulation both ways)."""
    t = idx_ref.shape[1]
    k0 = 1 if self0 else 0
    onehot = build_onehot(idx_ref, t, n, k, k0)
    xg = jnp.dot(onehot, x_ref[0],
                 preferred_element_type=jnp.float32)  # [K*T, C_in]
    # Gathered bf16 values in an f32 container -> exact round-trip.
    y = jnp.dot(xg.astype(jnp.bfloat16), w_ref[...],
                preferred_element_type=jnp.float32)  # [K*T, C_out]
    c = y.shape[-1]
    best = jnp.full((t, c), _NEG, jnp.float32)
    worst = jnp.full((t, c), -_NEG, jnp.float32)
    for kk in range(k):
        if self0 and kk == 0:
            vk = jnp.dot(_self_rows(x_ref, t), w_ref[...],
                         preferred_element_type=jnp.float32)
        else:
            i0 = (kk - k0) * t
            vk = y[i0:i0 + t, :]
        ok = mask_ref[0, :, kk][:, None] > 0
        best = jnp.maximum(best, jnp.where(ok, vk, _NEG))
        worst = jnp.minimum(worst, jnp.where(ok, vk, -_NEG))
    mx_ref[0] = best.astype(mx_ref.dtype)
    mn_ref[0] = worst.astype(mn_ref.dtype)


def _bn_lrelu_epilogue(best, aff_ref, mask_ref, self_rows=None):
    """The eval-mode BatchNorm+LeakyReLU epilogue, fused in-kernel.

    Replays the caller's XLA epilogue op-for-op (nn/deltaconv.py eval
    branches) so fused == unfused BIT-exactly: the running max rounds
    to bf16 first (the unfused kernels write bf16 outputs), the affine
    runs in f32 in the same association order, and all-masked rows
    zero out. ``aff_ref`` holds [sign, inv, mean, bias] as a [4, C]
    f32 block; ``self_rows`` (f32, already bf16-valued) subtracts the
    tile's own features before the sign fold (EdgeMaxMLP's
    ``max_k(y_j) - y_i`` centralized form)."""
    mxb = best.astype(jnp.bfloat16).astype(jnp.float32)
    sign = aff_ref[0:1, :]
    inv = aff_ref[1:2, :]
    mean = aff_ref[2:3, :]
    bias = aff_ref[3:4, :]
    if self_rows is not None:
        # masked_nbr_max maps all-masked rows to 0 pre-subtract; the
        # final valid-select zeroes them either way.
        mxb = jnp.where(jnp.sum(mask_ref[0], axis=1)[:, None] > 0,
                        mxb, 0.0)
        h_star = sign * (mxb - self_rows)
    else:
        h_star = sign * mxb
    o = (h_star - mean) * inv + bias
    o = jnp.where(o >= 0, o, 0.2 * o)
    valid = jnp.sum(mask_ref[0], axis=1)[:, None] > 0
    return jnp.where(valid, o, 0.0)


def _max_affine_kernel(idx_ref, mask_ref, hilo_ref, aff_ref, out_ref,
                       *, k, n, self0, sub_self):
    """Masked neighbor max + fused BN/LeakyReLU epilogue (eval only,
    bf16 tables — no hi/lo pairing). ``sub_self`` implements
    EdgeMaxMLP's centralized form: the self features come from the
    direct row read when ``self0`` (unpadded tiles) or from the one-hot
    slot-0 gather otherwise (both exact for bf16 tables)."""
    t = idx_ref.shape[1]
    k0 = 1 if self0 else 0
    onehot = build_onehot(idx_ref, t, n, k, k0)
    val = jnp.dot(onehot, hilo_ref[0],
                  preferred_element_type=jnp.float32)
    best = jnp.full((t, val.shape[-1]), _NEG, jnp.float32)
    self_rows = None
    for kk in range(k):
        if self0 and kk == 0:
            vk = _self_rows(hilo_ref, t).astype(jnp.float32)
        else:
            i0 = (kk - k0) * t
            vk = val[i0:i0 + t, :]
        if kk == 0 and sub_self:
            self_rows = vk
        ok = mask_ref[0, :, kk][:, None] > 0
        best = jnp.maximum(best, jnp.where(ok, vk, _NEG))
    out = _bn_lrelu_epilogue(best, aff_ref, mask_ref, self_rows)
    out_ref[0] = out.astype(out_ref.dtype)


def gather_max_affine(h, idx, mask, affine, sub_self=False, tile=128,
                      interpret=False):
    """Forward-only masked neighbor max with the eval BatchNorm +
    LeakyReLU epilogue fused into the kernel: saves one full XLA
    elementwise pass (HBM read+write of the [B, N, C] max) per conv.

    ``affine = (sign, inv, mean, bias)`` — each ``[C]`` f32 — computes
    ``lrelu0.2((sign * max - mean) * inv + bias)`` (with the self row
    subtracted inside the sign fold when ``sub_self``), zeroing rows
    with no valid neighbor. Requires bf16 ``h`` and the kNN
    self-slot-0 convention. Bit-exact vs the unfused
    ``masked_nbr_max`` + XLA epilogue (test-pinned)."""
    b, n, c = h.shape
    k = idx.shape[-1]
    assert h.dtype == jnp.bfloat16, "affine epilogue path is bf16-only"
    tile = fit_tile(tile, k * (2 * n + 12 * c))
    idx_p = _pad_to(idx.astype(jnp.int32), tile, 1)
    mask_p = _pad_to(mask.astype(jnp.int32), tile, 1)
    n_pad = idx_p.shape[1]
    self0 = n_pad == n  # padded tiles gather self via the slot-0 one-hot
    aff = jnp.stack([a.astype(jnp.float32) for a in affine])  # [4, C]

    spec_t = pl.BlockSpec((1, tile, k), lambda ib, it: (ib, it, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_max_affine_kernel, k=k, n=n, self0=self0,
                          sub_self=sub_self),
        grid=(b, n_pad // tile),
        in_specs=[
            spec_t, spec_t,
            pl.BlockSpec((1, n, c), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, c), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda ib, it: (ib, it, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c), jnp.bfloat16),
        interpret=interpret,
    )(idx_p, mask_p, h, aff)
    return out[:, :n]


def _mm_max_kernel(idx_ref, mask_ref, x_ref, w_ref, *rest,
                   k, n, self0=False, affine=False):
    """Single-chain variant of ``_mm_minmax_kernel``: callers that
    sign-fold the downstream monotone map into ``w``'s columns
    (``w' = w * sign(slope)``, so ``max_k y' = sign * extreme``) only
    need the max — half the select work and half the output traffic.
    With ``affine`` the eval BN/LeakyReLU epilogue runs in-kernel
    (``_bn_lrelu_epilogue``) and the output is the final activation."""
    aff_ref, mx_ref = rest if affine else (None, rest[0])
    t = idx_ref.shape[1]
    k0 = 1 if self0 else 0
    onehot = build_onehot(idx_ref, t, n, k, k0)
    xg = jnp.dot(onehot, x_ref[0],
                 preferred_element_type=jnp.float32)  # [K*T, C_in]
    y = jnp.dot(xg.astype(jnp.bfloat16), w_ref[...],
                preferred_element_type=jnp.float32)  # [K*T, C_out]
    c = y.shape[-1]
    best = jnp.full((t, c), _NEG, jnp.float32)
    for kk in range(k):
        if self0 and kk == 0:
            vk = jnp.dot(_self_rows(x_ref, t), w_ref[...],
                         preferred_element_type=jnp.float32)
        else:
            i0 = (kk - k0) * t
            vk = y[i0:i0 + t, :]
        ok = mask_ref[0, :, kk][:, None] > 0
        best = jnp.maximum(best, jnp.where(ok, vk, _NEG))
    if affine:
        mx_ref[0] = _bn_lrelu_epilogue(best, aff_ref, mask_ref).astype(
            mx_ref.dtype)
    else:
        mx_ref[0] = best.astype(mx_ref.dtype)


def gather_matmul_max(x, w, idx, mask, tile=128, interpret=False,
                      self_slot0=False, affine=None):
    """``x [B, N, C_in] bf16, w [C_in, C_out] bf16 -> max`` of
    ``(x @ w)[idx]`` over valid neighbors — the single-chain eval fast
    path (the caller sign-folds the BatchNorm slope into ``w``, see
    ``_mm_max_kernel``). Forward-only. Rows with no valid neighbor
    return ``-3e38`` (callers mask them). With ``affine = (sign, inv,
    mean, bias)`` (each ``[C_out]`` f32) the eval BN/LeakyReLU
    epilogue is fused in-kernel and the result is the final activation
    with all-masked rows zeroed — bit-exact vs the unfused kernel +
    XLA epilogue (test-pinned)."""
    b, n, c_in = x.shape
    c_out = w.shape[-1]
    k = idx.shape[-1]
    tile = fit_tile(tile, k * (2 * n + 6 * c_in + 4 * c_out),
                    budget=12 * 2**20)
    idx_p = _pad_to(idx.astype(jnp.int32), tile, 1)
    mask_p = _pad_to(mask.astype(jnp.int32), tile, 1)
    n_pad = idx_p.shape[1]
    self0 = self_slot0 and n_pad == n

    spec_t = pl.BlockSpec((1, tile, k), lambda ib, it: (ib, it, 0),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((1, tile, c_out), lambda ib, it: (ib, it, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [
        spec_t, spec_t,
        pl.BlockSpec((1, n, c_in), lambda ib, it: (ib, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c_in, c_out), lambda ib, it: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [idx_p, mask_p, x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)]
    if affine is not None:
        in_specs.append(pl.BlockSpec((4, c_out), lambda ib, it: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.stack([a.astype(jnp.float32) for a in affine]))
    mx = pl.pallas_call(
        functools.partial(_mm_max_kernel, k=k, n=n, self0=self0,
                          affine=affine is not None),
        grid=(b, n_pad // tile),
        in_specs=in_specs,
        out_specs=spec_o,
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c_out), jnp.bfloat16),
        interpret=interpret,
    )(*args)
    return mx[:, :n]


def gather_matmul_minmax(x, w, idx, mask, tile=128, interpret=False,
                         self_slot0=False):
    """``x [B, N, C_in] bf16, w [C_in, C_out] bf16 -> (max, min)`` of
    ``(x @ w)[idx]`` over valid neighbors. Forward-only (no VJP) — the
    eval-mode fast path of the scalar max branch; training routes
    through :func:`masked_nbr_max`. Rows with no valid neighbor return
    ``(-3e38, +3e38)`` (callers mask them)."""
    b, n, c_in = x.shape
    c_out = w.shape[-1]
    k = idx.shape[-1]
    # onehot [K*T, N] bf16 + gathered [K*T, C_in] f32+bf16 + product
    # [K*T, C_out] f32.
    tile = fit_tile(tile, k * (2 * n + 6 * c_in + 4 * c_out),
                    budget=12 * 2**20)
    idx_p = _pad_to(idx.astype(jnp.int32), tile, 1)
    mask_p = _pad_to(mask.astype(jnp.int32), tile, 1)
    n_pad = idx_p.shape[1]
    self0 = self_slot0 and n_pad == n

    spec_t = pl.BlockSpec((1, tile, k), lambda ib, it: (ib, it, 0),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((1, tile, c_out), lambda ib, it: (ib, it, 0),
                          memory_space=pltpu.VMEM)
    odt = jax.ShapeDtypeStruct((b, n_pad, c_out), jnp.bfloat16)
    mx, mn = pl.pallas_call(
        functools.partial(_mm_minmax_kernel, k=k, n=n, self0=self0),
        grid=(b, n_pad // tile),
        in_specs=[
            spec_t, spec_t,
            pl.BlockSpec((1, n, c_in), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, c_out), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[spec_o, spec_o],
        out_shape=[odt, odt],
        interpret=interpret,
    )(idx_p, mask_p, x.astype(jnp.bfloat16), w.astype(jnp.bfloat16))
    return mx[:, :n], mn[:, :n]


# -- differentiable gather-then-matmul max (training fast path) -----------


def _mm_max_win_kernel(idx_ref, mask_ref, x_ref, w_ref, mx_ref, win_ref,
                       *, k, n, self0=False):
    """``_mm_max_kernel`` + winner-slot tracking for the training VJP:
    the one-hot contraction runs at C_in lanes (the whole point — the
    per-point-then-gather train path pays it at C_out), the layer
    kernel applies on the gathered block in VMEM, and the product is
    rounded to bf16 BEFORE the max so values AND winners match the
    per-point bf16 Dense of the reference pipeline exactly. ``self0``
    reads the tile's own rows for slot 0 (kNN self-loop promise) —
    one fewer compare pass and T fewer contraction rows."""
    t = idx_ref.shape[1]
    k0 = 1 if self0 else 0
    onehot = build_onehot(idx_ref, t, n, k, k0)
    xg = jnp.dot(onehot, x_ref[0],
                 preferred_element_type=jnp.float32)  # [(K-k0)*T, C_in]
    y = jnp.dot(xg.astype(jnp.bfloat16), w_ref[...],
                preferred_element_type=jnp.float32)  # [(K-k0)*T, C_out]
    y = y.astype(jnp.bfloat16).astype(jnp.float32)
    c = y.shape[-1]
    best = jnp.full((t, c), _NEG, jnp.float32)
    winner = jnp.zeros((t, c), jnp.int32)
    for kk in range(k):
        if self0 and kk == 0:
            vk = jnp.dot(_self_rows(x_ref, t), w_ref[...],
                         preferred_element_type=jnp.float32)
            vk = vk.astype(jnp.bfloat16).astype(jnp.float32)
        else:
            i0 = (kk - k0) * t
            vk = y[i0:i0 + t, :]
        vk = jnp.where(mask_ref[0, :, kk][:, None] > 0, vk, _NEG)
        upd = vk > best  # strict: first max wins (argmax semantics)
        best = jnp.where(upd, vk, best)
        winner = jnp.where(upd, kk, winner)
    mx_ref[0] = best.astype(mx_ref.dtype)
    win_ref[0] = winner


def _mm_train_pallas_fwd(x, w, idx, mask, tile=128, self0=False):
    b, n, c_in = x.shape
    c_out = w.shape[-1]
    k = idx.shape[-1]
    # onehot [K*T, N] bf16 + gathered [K*T, C_in] + product/round
    # [K*T, C_out] + winner selects.
    tile = fit_tile(tile, k * (2 * n + 6 * c_in + 8 * c_out),
                    budget=12 * 2**20)
    idx_p = _pad_to(idx.astype(jnp.int32), tile, 1)
    mask_p = _pad_to(mask.astype(jnp.int32), tile, 1)
    n_pad = idx_p.shape[1]
    self0 = self0 and n_pad == n
    spec_t = pl.BlockSpec((1, tile, k), lambda ib, it: (ib, it, 0),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((1, tile, c_out), lambda ib, it: (ib, it, 0),
                          memory_space=pltpu.VMEM)
    mx, win = pl.pallas_call(
        functools.partial(_mm_max_win_kernel, k=k, n=n, self0=self0),
        grid=(b, n_pad // tile),
        in_specs=[
            spec_t, spec_t,
            pl.BlockSpec((1, n, c_in), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, c_out), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[spec_o, spec_o],
        out_shape=[jax.ShapeDtypeStruct((b, n_pad, c_out), jnp.bfloat16),
                   jax.ShapeDtypeStruct((b, n_pad, c_out), jnp.int32)],
    )(idx_p, mask_p, x.astype(jnp.bfloat16), w.astype(jnp.bfloat16))
    return mx[:, :n], win[:, :n]


def _mm_train_reference_fwd(x, w, idx, mask):
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if x.dtype == jnp.bfloat16:  # match the kernel's pre-max rounding
        y = y.astype(jnp.bfloat16)
    g = jax.vmap(lambda a, i: a[i])(y, idx)  # [B, N, K, C_out]
    masked = jnp.where(mask[..., None], g.astype(jnp.float32), _NEG)
    winner = jnp.argmax(masked, axis=-2).astype(jnp.int32)
    out = jnp.max(masked, axis=-2)
    if x.dtype == jnp.bfloat16:
        out = out.astype(jnp.bfloat16)
    return out, winner


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gather_matmul_max_train(x, w, idx, mask, self_slot0=False):
    """Differentiable ``max_k (x @ w)[idx]`` over valid neighbors, the
    TRAIN-mode twin of :func:`gather_matmul_max`: the one-hot gather
    contraction runs at C_in lanes instead of C_out (the per-point
    Dense-then-gather path pays K·T·N·C_out MACs; this pays
    K·T·N·C_in + K·T·C_in·C_out — a ~1.6x MXU saving on the
    reference's last conv, 128 -> 256). The product is rounded to bf16
    before the max, so values and winner slots equal the reference
    pipeline's per-point bf16 Dense + neighbor max; gradients route to
    the single winning edge (torch-scatter semantics) and flow to BOTH
    ``x`` (via w^T) and ``w`` (via the gathered winner rows).
    All-masked rows return -3e38 (callers mask them). ``self_slot0``
    (kNN self-loop promise) reads/routes slot 0 by direct addressing
    in both the forward and the winner-routed backward."""
    out, _ = _mm_train_fwd_dispatch(x, w, idx, mask, self_slot0)
    return out


def _mm_train_fwd_dispatch(x, w, idx, mask, self_slot0=False):
    if jax.default_backend() == "tpu":
        return _mm_train_pallas_fwd(x, w, idx, mask, self0=self_slot0)
    return _mm_train_reference_fwd(x, w, idx, mask)


def _gmm_train_fwd(x, w, idx, mask, self_slot0):
    out, winner = _mm_train_fwd_dispatch(x, w, idx, mask, self_slot0)
    return out, (x, w, idx, winner)


def _gmm_train_bwd(self_slot0, res, g):
    x, w, idx, winner = res
    b, n, c_in = x.shape
    if jax.default_backend() == "tpu":
        # bf16 cotangents -> single half-width routing pass.
        dy = _pallas_bwd_mm(idx, [(winner, g)], n,
                            self0=self_slot0)  # [B, N, C_out] f32
    else:
        win_idx = _win_to_idx(idx, winner)
        c_out = g.shape[-1]
        dy = jnp.zeros((b, n, c_out), jnp.float32)
        bidx = jnp.arange(b)[:, None, None]
        cidx = jnp.arange(c_out)[None, None, :]
        dy = dy.at[bidx, win_idx, cidx].add(g.astype(jnp.float32))
    # Same contraction dtypes as the per-point Dense backward (bf16
    # operands, f32 accumulation).
    dyc = dy.astype(jnp.bfloat16) if x.dtype == jnp.bfloat16 else dy
    dx = jnp.dot(dyc, w.T.astype(dyc.dtype),
                 preferred_element_type=jnp.float32)
    dw = jnp.einsum("bni,bno->io", x.astype(dyc.dtype), dyc,
                    preferred_element_type=jnp.float32)
    return dx.astype(x.dtype), dw.astype(w.dtype), None, None


gather_matmul_max_train.defvjp(_gmm_train_fwd, _gmm_train_bwd)


# -- int8 quantized gathers (opt-in serving mode) -------------------------
#
# max commutes with the symmetric per-cloud quantization (a monotone
# non-decreasing map), so the quantized-domain neighbor max IS the
# quantization of the true max: the one-hot contraction — the dominant
# MXU cost of every gather — runs s8 x s8 -> s32 at twice the bf16
# rate. Used by geometry/dense.DenseGradDiv when the operators are
# int8 (accuracy-changing by construction; see PERF.md).

_I8_NEG = -(2 ** 30)  # "-inf" in the int32 quantized domain


def int8_quantize(h):
    """Symmetric per-cloud int8 quantization over the trailing
    (points, channels) axes: returns ``(h_q int8, scale [...])`` with
    ``h ~= h_q * scale``."""
    hf = h.astype(jnp.float32)
    ah = jnp.maximum(jnp.max(jnp.abs(hf), axis=(-2, -1)), 1e-30)
    hq = jnp.round(hf / ah[..., None, None] * 127.0).astype(jnp.int8)
    return hq, ah / jnp.float32(127.0)


def _max_int8_kernel(idx_ref, mask_ref, hq_ref, out_ref, *, k, n,
                     self0=False):
    """Quantized-domain masked neighbor max: int8 one-hot contraction
    (exact — the s32 accumulator holds the gathered int8 values), then
    the usual unrolled max chain in int32."""
    t = idx_ref.shape[1]
    c = hq_ref.shape[2]
    k0 = 1 if self0 else 0
    onehot = build_onehot(idx_ref, t, n, k, k0, dtype=jnp.int8)
    val = jax.lax.dot_general(
        onehot, hq_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)  # [(K-k0)*T, C]
    best = jnp.full((t, c), _I8_NEG, jnp.int32)
    for kk in range(k):
        if self0 and kk == 0:
            vk = _self_rows(hq_ref, t).astype(jnp.int32)
        else:
            i0 = (kk - k0) * t
            vk = val[i0:i0 + t, :]
        ok = mask_ref[0, :, kk][:, None] > 0
        best = jnp.maximum(best, jnp.where(ok, vk, _I8_NEG))
    out_ref[0] = best


def gather_max_int8(h, idx, mask, self_slot0=False, tile=128,
                    interpret=False):
    """Quantized masked neighbor max of ``h [B, N, C]``: quantizes per
    cloud, gathers+maxes in the int8 domain, dequantizes. All-masked
    rows return 0. Forward-only (serving). Error <= half a quantization
    step of the per-cloud range."""
    b, n, c = h.shape
    k = idx.shape[-1]
    hq, scale = int8_quantize(h)
    if jax.default_backend() == "tpu" or interpret:
        # onehot i8 [K*T, N] + gathered i32 [K*T, C]
        tile = fit_tile(tile, k * (n + 8 * c))
        idx_p = _pad_to(idx.astype(jnp.int32), tile, 1)
        mask_p = _pad_to(mask.astype(jnp.int32), tile, 1)
        n_pad = idx_p.shape[1]
        self0 = self_slot0 and n_pad == n
        spec_t = pl.BlockSpec((1, tile, k), lambda ib, it: (ib, it, 0),
                              memory_space=pltpu.VMEM)
        mx = pl.pallas_call(
            functools.partial(_max_int8_kernel, k=k, n=n, self0=self0),
            grid=(b, n_pad // tile),
            in_specs=[
                spec_t, spec_t,
                pl.BlockSpec((1, n, c), lambda ib, it: (ib, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile, c),
                                   lambda ib, it: (ib, it, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, n_pad, c), jnp.int32),
            interpret=interpret,
        )(idx_p, mask_p, hq)[:, :n]
    else:
        gathered = jax.vmap(lambda a, i: a[i])(hq.astype(jnp.int32), idx)
        mx = jnp.max(jnp.where(mask[..., None], gathered, _I8_NEG),
                     axis=-2)
    out = mx.astype(jnp.float32) * scale[..., None, None]
    any_valid = jnp.any(mask, axis=-1)[..., None]
    return jnp.where(any_valid, out, 0.0).astype(h.dtype)


def _mm_max_int8_kernel(idx_ref, mask_ref, xq_ref, w_ref, mx_ref,
                        *, k, n, self0=False):
    """Gather-then-matmul max with an int8 one-hot contraction: the
    gathered int8 values (exact, in the s32 accumulator) convert to
    bf16 (lossless, |v| <= 127) and the layer kernel applies in VMEM;
    the max chain runs in the quantized-input domain (the caller's
    positive dequantization scale commutes with max)."""
    t = idx_ref.shape[1]
    k0 = 1 if self0 else 0
    onehot = build_onehot(idx_ref, t, n, k, k0, dtype=jnp.int8)
    xg = jax.lax.dot_general(
        onehot, xq_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)  # [(K-k0)*T, C_in]
    y = jnp.dot(xg.astype(jnp.bfloat16), w_ref[...],
                preferred_element_type=jnp.float32)  # [(K-k0)*T, C_out]
    c = y.shape[-1]
    best = jnp.full((t, c), _NEG, jnp.float32)
    for kk in range(k):
        if self0 and kk == 0:
            vk = jnp.dot(_self_rows(xq_ref, t).astype(jnp.bfloat16),
                         w_ref[...], preferred_element_type=jnp.float32)
        else:
            i0 = (kk - k0) * t
            vk = y[i0:i0 + t, :]
        ok = mask_ref[0, :, kk][:, None] > 0
        best = jnp.maximum(best, jnp.where(ok, vk, _NEG))
    mx_ref[0] = best.astype(mx_ref.dtype)


def gather_matmul_max_int8(xq, w, idx, mask, tile=128, interpret=False,
                           self_slot0=False):
    """``xq [B, N, C_in] int8, w [C_in, C_out] bf16 -> max`` of
    ``(xq @ w)[idx]`` over valid neighbors, in the QUANTIZED-input
    domain (the caller dequantizes the result by its positive
    per-cloud scale — max commutes). Rows with no valid neighbor
    return ``-3e38`` (callers mask them). Forward-only."""
    b, n, c_in = xq.shape
    c_out = w.shape[-1]
    k = idx.shape[-1]
    if not (jax.default_backend() == "tpu" or interpret):
        y = jnp.dot(xq.astype(jnp.float32), w.astype(jnp.float32))
        gathered = jax.vmap(lambda a, i: a[i])(y, idx)
        return jnp.max(jnp.where(mask[..., None], gathered, _NEG),
                       axis=-2).astype(jnp.bfloat16)
    # onehot i8 [K*T, N] + gathered i32+bf16 [K*T, C_in] + y f32.
    tile = fit_tile(tile, k * (n + 6 * c_in + 4 * c_out),
                    budget=12 * 2**20)
    idx_p = _pad_to(idx.astype(jnp.int32), tile, 1)
    mask_p = _pad_to(mask.astype(jnp.int32), tile, 1)
    n_pad = idx_p.shape[1]
    self0 = self_slot0 and n_pad == n
    spec_t = pl.BlockSpec((1, tile, k), lambda ib, it: (ib, it, 0),
                          memory_space=pltpu.VMEM)
    mx = pl.pallas_call(
        functools.partial(_mm_max_int8_kernel, k=k, n=n, self0=self0),
        grid=(b, n_pad // tile),
        in_specs=[
            spec_t, spec_t,
            pl.BlockSpec((1, n, c_in), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, c_out), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c_out),
                               lambda ib, it: (ib, it, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c_out), jnp.bfloat16),
        interpret=interpret,
    )(idx_p, mask_p, xq, w.astype(jnp.bfloat16))
    return mx[:, :n]


def masked_nbr_max(h, nbr_idx, nbr_mask, self_slot0=False):
    """Convenience wrapper over :func:`gather_max`: accepts unbatched
    ``[N, C]`` or batched ``[B, N, C]`` features, replaces the -inf of
    all-masked rows with 0 (padded points)."""
    unbatched = h.ndim == 2
    if unbatched:
        h, nbr_idx, nbr_mask = h[None], nbr_idx[None], nbr_mask[None]
    out = gather_max(h, nbr_idx, nbr_mask, self_slot0)
    any_valid = jnp.any(nbr_mask, axis=-1)[..., None]
    out = jnp.where(any_valid, out, 0.0).astype(h.dtype)
    return out[0] if unbatched else out
