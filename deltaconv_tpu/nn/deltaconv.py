"""The DeltaConv layer: coordinate-independent scalar+vector convolution.

Reference: /root/reference/deltaconv/nn/deltaconv.py:8-73.

Scalar stream:
  ``x' = maxagg_k(s_mlp_max(x)[nbr]) + s_mlp([x, div v, curl v, |v|])``
  (the first/centralized variant runs ``s_mlp_max`` on ``x_j - x_i``
  per edge before aggregating).
Vector stream (skipped on the last layer):
  ``v' = v_mlp(I_J([v, hodge_laplacian(v), grad x']))``

The PyG ragged scatter-max becomes a dense masked max over the fixed
``[N, K]`` neighbor axis — a plain VPU reduction, no scatter at all.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as lnn
import jax
import jax.numpy as jnp

from ..geometry.grad_div import GradDiv
from ..geometry.operators import I_J, J, curl, norm
from .init import torch_linear_kernel
from .mlp import MLP, VectorMLP
from .nonlin import leaky_relu02

__all__ = ["DeltaConv", "EdgeMaxMLP", "DeepMaxMLP", "gather_neighbors"]

# Test hooks: run DeepMaxMLP's fused eval kernel in Pallas interpret
# mode on CPU backends (the CPU suite pins fused == reference without
# a chip), or force the reference path on TPU (A/B tests). Never set
# in production.
_FORCE_FUSED_INTERPRET = False
_FORCE_FUSED_OFF = False
# Take PointMaxMLP's commuted TRAIN branch on any backend (the op
# falls back to its XLA reference path off-TPU) — CPU parity tests.
_FORCE_FUSED_TRAIN = False
# Keep the eval BN/LeakyReLU epilogue in XLA instead of fusing it into
# the gather kernels (A/B measurement + parity tests). Never set in
# production.
_FORCE_EPILOGUE_OFF = False
# The fused centralized depth-2 TRAIN path (edge_delta_mlp): MEASURED
# NEGATIVE on the seg config and off by default — 50.2 ms/step (stash
# variant; 55.1 recompute variant) vs 44.7 ms for the edge-tensor
# reference path (2026-08-20 traces, PERF.md "round 5"). The op and
# its tests stay (the structure is right for shapes where the moments
# gather and kernel passes amortize better); flip for A/B.
_EDGE_FUSED_TRAIN = False


def _epilogue_fusible(gd, dt, train):
    """ONE definition of when the eval BN/LeakyReLU epilogue may run
    inside a gather kernel (all three conv call sites gate on this):
    eval only, bf16 activations, an operator object exposing the
    affine kernels (ShardedGradDiv does not), not the int8 serving
    path (its epilogue stays in XLA), on TPU or under the interpret
    test hook."""
    return (not train and dt == jnp.bfloat16
            and not _FORCE_EPILOGUE_OFF
            and not getattr(gd, "_int8", False)
            and hasattr(gd, "nbr_max_affine")
            and (jax.default_backend() == "tpu"
                 or _FORCE_FUSED_INTERPRET))


def gather_neighbors(x, nbr_idx):
    """Gather per-neighbor features: ``x[..., N, C], idx[..., N, K] ->
    [..., N, K, C]`` with any number of leading batch axes."""
    if nbr_idx.ndim == 2:
        return x[nbr_idx]
    return jax.vmap(gather_neighbors)(x, nbr_idx)


@jax.custom_vjp
def _masked_max(h, mask):
    """Max over axis -2 with single-winner gradient routing.

    Forward is a plain VPU reduce. The backward scatters each output
    cotangent to exactly ONE winning slot via an elementwise iota ==
    argmax compare (torch-scatter semantics) — never a gather/scatter
    op, and deterministic under any SPMD partitioning (XLA's eq-based
    reduce_max transpose splits across near-ties and is sensitive to
    reduction order).
    """
    neg = jnp.asarray(-jnp.inf, h.dtype)
    return jnp.max(jnp.where(mask, h, neg), axis=-2)


def _masked_max_fwd(h, mask):
    neg = jnp.asarray(-jnp.inf, h.dtype)
    masked = jnp.where(mask, h, neg)
    winner = jnp.argmax(masked, axis=-2).astype(jnp.int32)  # [..., C]
    return jnp.max(masked, axis=-2), (winner, h.shape[-2])


def _masked_max_bwd(res, g):
    winner, k = res
    k_iota = jnp.arange(k, dtype=jnp.int32).reshape(
        (1,) * (winner.ndim - 1) + (k, 1)
    )
    dh = jnp.where(k_iota == winner[..., None, :], g[..., None, :], 0.0)
    return dh.astype(g.dtype), None


_masked_max.defvjp(_masked_max_fwd, _masked_max_bwd)


@jax.custom_vjp
def _masked_max_kmajor(h, mask):
    """``_masked_max`` over axis -3 of a K-MAJOR edge block:
    ``h [..., K, N, C], mask [..., K, N] -> [..., N, C]`` with the
    same single-winner backward routing (no 100+ MB layout transpose
    for edge_delta_mlp's output)."""
    neg = jnp.asarray(-jnp.inf, h.dtype)
    return jnp.max(jnp.where(mask[..., None], h, neg), axis=-3)


def _masked_max_kmajor_fwd(h, mask):
    neg = jnp.asarray(-jnp.inf, h.dtype)
    masked = jnp.where(mask[..., None], h, neg)
    winner = jnp.argmax(masked, axis=-3).astype(jnp.int32)  # [..., N, C]
    return jnp.max(masked, axis=-3), (winner, h.shape[-3])


def _masked_max_kmajor_bwd(res, g):
    winner, k = res
    k_iota = jnp.arange(k, dtype=jnp.int32).reshape(
        (1,) * (winner.ndim - 2) + (k, 1, 1))
    dh = jnp.where(k_iota == winner[..., None, :, :],
                   g[..., None, :, :], 0.0)
    return dh.astype(g.dtype), None


_masked_max_kmajor.defvjp(_masked_max_kmajor_fwd, _masked_max_kmajor_bwd)


def _aggregate(h, nbr_mask, aggr: str):
    """Masked aggregation over the neighbor axis: [..., K, C] -> [..., C]."""
    mask = nbr_mask[..., None]
    if aggr == "max":
        out = _masked_max(h, mask)
        # Rows with no valid neighbor (padded points) -> 0, not -inf.
        return jnp.where(jnp.any(nbr_mask, axis=-1)[..., None], out, 0.0)
    if aggr == "mean":
        m = mask.astype(h.dtype)
        cnt = jnp.maximum(jnp.sum(m, axis=-2), 1.0)
        return jnp.sum(h * m, axis=-2) / cnt
    if aggr == "sum" or aggr == "add":
        return jnp.sum(h * mask.astype(h.dtype), axis=-2)
    raise ValueError(f"unknown aggregation '{aggr}'")


class _BNState(lnn.Module):
    """BatchNorm parameters/stats with flax's exact variable layout
    (scale/bias params, mean/var batch_stats) for callers that COMMUTE
    the normalization through a monotone aggregation: returns the
    effective affine ``(inv, mean, bias)`` with
    ``z = (h - mean) * inv + bias``, updating running statistics from
    externally computed batch moments in train mode."""

    momentum: float = 0.9
    epsilon: float = 1e-5

    @lnn.compact
    def __call__(self, c, batch_mean, batch_var, train: bool = False):
        scale = self.param("scale", lnn.initializers.ones, (c,))
        bias = self.param("bias", lnn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda *_: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda *_: jnp.ones((c,), jnp.float32))
        if train:
            mean, var = batch_mean, batch_var
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        return inv, mean, bias


class _BNStateHolder(lnn.Module):
    """Name-level shim so the commuted BN's variables live at
    ``bn0/BatchNorm_0/...`` exactly like MLP's BatchNorm wrapper."""

    @lnn.compact
    def __call__(self, *args, **kwargs):
        return _BNState(name="BatchNorm_0")(*args, **kwargs)


class EdgeMaxMLP(lnn.Module):
    """Centralized scalar branch WITHOUT the edge tensor.

    The reference computes ``max_k MLP(x_j - x_i)`` over a
    ``[B, N, K, C]`` edge tensor (deltaconv.py:50-54). For a depth-1
    MLP (bias-free Dense -> BatchNorm -> LeakyReLU) the aggregation
    commutes: Dense is linear, so the edge value is ``y_j - y_i`` with
    ``y = Dense(x)`` computed ONCE per point, and BatchNorm+LeakyReLU
    is a per-channel monotone map whose surviving extreme is found
    with ONE max chain by sign-folding: with ``s = sign(inv)`` and
    ``y' = s * y``, ``max_k (y'_j - y'_i) = s * (extreme_j - y_i)`` —
    no separate min pass. Train-mode BatchNorm statistics over the
    edge population come from neighbor SUMS of ``[y, y^2]``
    (ops/gather_sum.py):

      sum_e (y_j - y_i)   = sum_n s1_n - cnt_n y_n
      sum_e (y_j - y_i)^2 = sum_n s2_n - 2 y_n s1_n + cnt_n y_n^2

    Everything is exact up to float reassociation; gradients route
    through the single-winner max VJP exactly like the edge path.
    The parameter tree (lin0/kernel, bn0/BatchNorm_0/{scale,bias} +
    batch_stats {mean,var}) is IDENTICAL to ``MLP([C])``, so
    checkpoints and the torch importer are path-compatible.
    """

    out_channels: int
    dtype: Optional[str] = None
    # Mesh axis for cross-shard edge statistics (point-sharded
    # training): the BatchNorm moments sum over ALL edges of the cloud.
    axis_name: Optional[str] = None

    @lnn.compact
    def __call__(self, x, gd, train: bool = False, stats_mask=None):
        """``gd``: operator object providing the neighbor protocol
        (geometry/nbr_ops.py). ``stats_mask``: edge validity for
        BatchNorm statistics (None reproduces the reference's mask-free
        BN, which includes padded edges pointing at index 0)."""
        dt = jnp.dtype(self.dtype) if self.dtype else jnp.float32
        y = lnn.Dense(self.out_channels, use_bias=False, dtype=dt,
                      kernel_init=torch_linear_kernel, name="lin0")(x)
        y = y.astype(dt).astype(jnp.float32)

        mean = var = None
        if train:
            smask = (jnp.ones(gd.nbr_idx.shape, bool)
                     if stats_mask is None else stats_mask)
            s = gd.nbr_sum(jnp.concatenate([y, y * y], axis=-1), smask)
            c = self.out_channels
            s1, s2 = s[..., :c], s[..., c:]
            cnt = jnp.sum(smask, axis=-1).astype(jnp.float32)[..., None]
            e_total = jnp.sum(cnt)
            lead = tuple(range(y.ndim - 1))
            sum_h = jnp.sum(s1 - cnt * y, axis=lead)
            sum_h2 = jnp.sum(s2 - 2.0 * y * s1 + cnt * y * y, axis=lead)
            if self.axis_name:
                sum_h = jax.lax.psum(sum_h, self.axis_name)
                sum_h2 = jax.lax.psum(sum_h2, self.axis_name)
                e_total = jax.lax.psum(e_total, self.axis_name)
            e_total = jnp.maximum(e_total, 1.0)
            mean = sum_h / e_total
            var = jnp.maximum(sum_h2 / e_total - mean * mean, 0.0)

        inv, mean_, bias = _BNStateHolder(name="bn0")(
            self.out_channels, mean, var, train)
        sign = jnp.where(inv >= 0, 1.0, -1.0)
        yp = (y * sign).astype(dt)  # bf16 kernels run single-pass
        if _epilogue_fusible(gd, dt, train):
            # Eval: the whole epilogue (self-subtract, sign fold, BN
            # affine, LeakyReLU, padded-row zeroing) runs inside the
            # gather kernel — bit-exact vs the XLA epilogue below.
            return gd.nbr_max_affine(yp, (sign, inv, mean_, bias),
                                     sub_self=True,
                                     interpret=_FORCE_FUSED_INTERPRET)
        mxp = gd.nbr_max(yp, self_slot0=True)
        h_star = sign * (mxp.astype(jnp.float32)
                         - yp.astype(jnp.float32))
        out = leaky_relu02((h_star - mean_) * inv + bias)
        any_valid = jnp.any(gd.nbr_mask, axis=-1)[..., None]
        return jnp.where(any_valid, out, 0.0).astype(dt)


class _Kernel(lnn.Module):
    """Bias-free Dense kernel declared so the parent can ALSO hand the
    raw weight matrix to a fused Pallas kernel. Parameter path
    (``<name>/kernel``) and initializer match the framework's Dense
    layers (torch-faithful init, nn/init.py)."""

    features: int

    @lnn.compact
    def __call__(self, x):
        w = self.param("kernel", torch_linear_kernel,
                       (x.shape[-1], self.features), jnp.float32)
        return w


class PointMaxMLP(lnn.Module):
    """Non-centralized scalar max branch:
    ``max_k LeakyReLU(BN(Dense(x)[nbr_k]))``.

    Training runs the reference pipeline (Dense -> BatchNorm ->
    LeakyReLU per point, then the fused neighbor gather+max, which has
    the single-winner VJP). Eval commutes the aggregation through the
    monotone per-channel affine+LeakyReLU with SIGN-FOLDING: columns
    of the Dense kernel are flipped by ``sign(inv)`` so one max chain
    finds the surviving extreme (``max_k s*y = s * extreme``), and the
    fused ``gather_matmul_max`` kernel gathers the INPUT features
    (width C_in instead of C_out — 1.6x fewer one-hot MACs on the
    reference's last conv) and applies the flipped kernel in VMEM.
    Parameter tree (lin0/kernel, bn0/BatchNorm_0/...) is identical to
    ``MLP([C])``, so checkpoints and the torch importer are
    path-compatible."""

    out_channels: int
    dtype: Optional[str] = None
    axis_name: Optional[str] = None

    @lnn.compact
    def __call__(self, x, gd, train: bool = False, stats_mask=None):
        from .nonlin import BatchNorm

        dt = jnp.dtype(self.dtype) if self.dtype else jnp.float32
        w = _Kernel(self.out_channels, name="lin0")(x)

        def pad128(c):
            return -(-c // 128) * 128

        # The fused path only wins when the gathered width is LANE-
        # NARROWER than the output (the one-hot contraction pays per
        # 128-lane block); otherwise it adds an edge matmul for free.
        narrower = pad128(x.shape[-1]) < pad128(self.out_channels)
        fused = (not train and dt == jnp.bfloat16
                 and jax.default_backend() == "tpu" and narrower)
        fused_train = (train and not _FORCE_FUSED_OFF
                       and hasattr(gd, "nbr_matmul_max_train")
                       and not getattr(gd, "_int8", False)
                       and (_FORCE_FUSED_TRAIN
                            or (dt == jnp.bfloat16 and narrower
                                and jax.default_backend() == "tpu")))
        if fused:
            inv, mean_, bias = _BNStateHolder(name="bn0")(
                self.out_channels, None, None, False)
            sign = jnp.where(inv >= 0, 1.0, -1.0)
            wp = (w * sign[None, :]).astype(dt)
            if _epilogue_fusible(gd, dt, train):
                # The BN/LeakyReLU epilogue runs inside the gather
                # kernel (bit-exact vs the XLA epilogue below).
                out = gd.nbr_matmul_max(
                    x.astype(dt), wp, self_slot0=True,
                    affine=(sign, inv, mean_, bias))
            else:
                mxp = gd.nbr_matmul_max(x.astype(dt), wp,
                                        self_slot0=True)
                y_star = sign * mxp.astype(jnp.float32)
                out = leaky_relu02((y_star - mean_) * inv + bias)
                any_valid = jnp.any(gd.nbr_mask, axis=-1)[..., None]
                out = jnp.where(any_valid, out, 0.0).astype(dt)
        elif fused_train:
            # Commuted training branch: the per-point Dense feeds ONLY
            # the BatchNorm batch moments (cheap [N, C_in]@[C_in, C_out]
            # matmul); the neighbor max runs on the sign-folded
            # gather-then-matmul kernel at C_in lanes with the
            # single-winner VJP. Exact commute: BatchNorm + LeakyReLU
            # is per-channel monotone in y, so
            # max_k h_j == monotone(sign * max_k (sign * y_j)); the
            # kernel rounds its product to bf16 pre-max, matching the
            # per-point bf16 Dense values and winners.
            y = jnp.dot(x.astype(dt), w.astype(dt))
            y32 = y.astype(jnp.float32)
            # flax BatchNorm's batch moments (fast variance, masked
            # means over all leading axes, pmean over axis_name).
            m_ = stats_mask
            if m_ is not None and m_.ndim == y.ndim - 1:
                m_ = m_[..., None]
            lead = tuple(range(y.ndim - 1))
            mean = jnp.mean(y32, lead, where=m_)
            mean2 = jnp.mean(y32 * y32, lead, where=m_)
            if self.axis_name:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = mean2 - mean * mean
            inv, mean_, bias = _BNStateHolder(name="bn0")(
                self.out_channels, mean, var, True)
            sign = jnp.where(inv >= 0, 1.0, -1.0)
            wp = (w * sign[None, :]).astype(dt)
            mxp = gd.nbr_matmul_max_train(x.astype(dt), wp)
            y_star = sign * mxp.astype(jnp.float32)
            out = leaky_relu02((y_star - mean_) * inv + bias)
            any_valid = jnp.any(gd.nbr_mask, axis=-1)[..., None]
            out = jnp.where(any_valid, out, 0.0).astype(dt)
        else:
            if _epilogue_fusible(gd, dt, train):
                # Eval, equal-lane case (gather-after-MLP): commute the
                # monotone BN+LeakyReLU through the max by sign folding
                # so the epilogue runs once per POINT inside the gather
                # kernel instead of once per point before it plus a
                # masking pass after. Rounding moves past the max
                # (values bf16-rounded once at the end instead of
                # per-point pre-max) — within the eval fast paths'
                # documented bf16 tolerance.
                inv, mean_, bias = _BNStateHolder(name="bn0")(
                    self.out_channels, None, None, False)
                sign = jnp.where(inv >= 0, 1.0, -1.0)
                y = jnp.dot(x.astype(dt), w.astype(dt))
                yp = (y.astype(jnp.float32) * sign).astype(dt)
                return gd.nbr_max_affine(
                    yp, (sign, inv, mean_, bias),
                    interpret=_FORCE_FUSED_INTERPRET)
            bn = BatchNorm(name="bn0", axis_name=self.axis_name)
            y = jnp.dot(x.astype(dt), w.astype(dt))  # == Dense(dtype=dt)
            h = leaky_relu02(bn(y, train=train, mask=stats_mask))
            out = gd.nbr_max(h.astype(dt), self_slot0=True)
        return out


class DeepMaxMLP(lnn.Module):
    """Depth>=2 scalar max branch, centralized or plain.

    Training and CPU/f32 eval run the reference pipeline — the
    edge-tensor MLP for the centralized variant (reference
    deltaconv.py:50-54), per-point MLP + fused neighbor max otherwise.
    bf16 TPU eval runs the fused gather+MLP+max kernel
    (ops/gather_mlp_max.py): the one-hot gather contraction at C_in
    lanes, the whole eval-mode MLP applied on the gathered block in
    VMEM, the LAST layer's BatchNorm+LeakyReLU commuted out of the max
    by sign folding, and the kNN self slot contributed by a per-point
    matmul outside the kernel. The segmentation config (mlp_depth=2,
    train_shapenet.py:79-89) otherwise materializes a ``[B, N, K, C]``
    edge tensor (centralized) or gathers at C_out lanes.

    Parameter tree (lin{i}/kernel, bn{i}/BatchNorm_0/{scale,bias} +
    batch_stats {mean,var}) is IDENTICAL to ``MLP(channels)``, so
    checkpoints and the torch importer are path-compatible.
    """

    channels: Sequence[int]
    centralized: bool = False
    dtype: Optional[str] = None
    axis_name: Optional[str] = None

    @lnn.compact
    def __call__(self, x, gd, train: bool = False, stats_mask=None):
        from .nonlin import BatchNorm

        dt = jnp.dtype(self.dtype) if self.dtype else jnp.float32
        if self.dtype:
            # The fused kernel gathers in bf16; round the inputs ONCE
            # here so both paths see identical operands (the production
            # backbone already feeds bf16 — deltanet_base.py casts
            # before the conv stack).
            x = x.astype(dt)

        def pad128(c):
            return -(-c // 128) * 128

        # The fused kernel pays the one-hot contraction at C_in lanes;
        # the plain path gathers the MLP OUTPUT at C_out lanes — fusing
        # only wins when the input is lane-narrower (always true for
        # the centralized variant, whose fallback is the edge tensor).
        interpret = _FORCE_FUSED_INTERPRET
        # The fused eval kernel gathers FEATURES in bf16 regardless of
        # the operator dtype, so it stays engaged under int8 OPERATORS
        # (geometry/dense.py serving mode): the int8 trade lives in the
        # operator applies/densify, not in this gather.
        fused = (not _FORCE_FUSED_OFF
                 and not train and dt == jnp.bfloat16
                 and (jax.default_backend() == "tpu" or interpret)
                 and (self.centralized
                      or pad128(x.shape[-1]) < pad128(self.channels[-1])))

        if fused:
            from ..ops.gather_mlp_max import gather_mlp_max

            ws, affines = [], []
            c_prev = x.shape[-1]
            inv = mean_ = bias = None
            for i, ch in enumerate(self.channels):
                ws.append(_Kernel(ch, name=f"lin{i}")(
                    jnp.zeros((1, c_prev))))
                inv, mean_, bias = _BNStateHolder(name=f"bn{i}")(
                    ch, None, None, False)
                if i < len(self.channels) - 1:
                    affines.append((inv, bias - mean_ * inv))
                c_prev = ch
            sign = jnp.where(inv >= 0, 1.0, -1.0)
            ws[-1] = ws[-1] * sign[None, :]

            def chain(h):
                """Eval MLP with the kernel's exact rounding."""
                h = h.astype(jnp.bfloat16)
                for w, (a, b) in zip(ws[:-1], affines):
                    y = jnp.dot(h, w.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
                    y = y.astype(jnp.bfloat16).astype(jnp.float32)
                    h = leaky_relu02(y * a + b).astype(jnp.bfloat16)
                z = jnp.dot(h, ws[-1].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                return z.astype(jnp.bfloat16).astype(jnp.float32)

            unbatched = gd.nbr_idx.ndim == 2
            xb = x[None] if unbatched else x
            idx = gd.nbr_idx[None] if unbatched else gd.nbr_idx
            mask = gd.nbr_mask[None] if unbatched else gd.nbr_mask
            # Self slot (kNN slot 0): centralized edges are the zero
            # vector — one constant chain; otherwise the per-point MLP.
            z0 = (chain(jnp.zeros((1, x.shape[-1]), dt))[0]  # [C]
                  if self.centralized else chain(xb.astype(dt)))
            if not _FORCE_EPILOGUE_OFF:
                # The self-slot merge AND the BN/LeakyReLU epilogue run
                # inside the kernel — bit-exact vs the XLA tail below.
                # Deliberately NOT _epilogue_fusible: the enclosing
                # `fused` gate already pins eval/bf16/backend, and this
                # kernel stays engaged under int8 OPERATORS (the int8
                # trade lives in the operator applies, not here).
                m = gather_mlp_max(xb.astype(dt), ws, affines, idx,
                                   mask, centralized=self.centralized,
                                   skip_slot0=True, interpret=interpret,
                                   z0=z0,
                                   epilogue=(sign, inv, mean_, bias))
                return m[0] if unbatched else m
            m = gather_mlp_max(xb.astype(dt), ws, affines, idx, mask,
                               centralized=self.centralized,
                               skip_slot0=True, interpret=interpret)
            if self.centralized:
                z0 = jnp.broadcast_to(z0[None, None, :], m.shape)
            m = jnp.maximum(m, jnp.where(mask[..., 0:1], z0, -3.0e38))
            if unbatched:
                m = m[0]
            z_star = sign * m
            out = leaky_relu02((z_star - mean_) * inv + bias)
            any_valid = jnp.any(gd.nbr_mask, axis=-1)[..., None]
            return jnp.where(any_valid, out, 0.0).astype(dt)

        # Fused centralized depth-2 TRAIN path: the reference pipeline
        # below materializes [..., N, K, C] edge tensors through the
        # whole MLP in BOTH directions (the dominant cost of the seg
        # train step — PERF.md). Here layer 0 commutes through the
        # edge difference like EdgeMaxMLP (y = Dense_0(x) per POINT,
        # edge value y_j - y_i; BatchNorm_0 edge moments from neighbor
        # SUMS), the Pallas op edge_delta_mlp computes
        # lrelu(affine_0(y_j - y_i)) @ W_1 per edge with recompute-in-
        # backward, and only ONE bf16 tensor (y1) is materialized for
        # the differentiable XLA BatchNorm_1 + max tail. Parameter
        # tree unchanged (lin{i}/bn{i}).
        fused_train = (train and not _FORCE_FUSED_OFF
                       and (_EDGE_FUSED_TRAIN or _FORCE_FUSED_TRAIN)
                       and self.centralized and len(self.channels) == 2
                       and dt == jnp.bfloat16
                       and hasattr(gd, "nbr_max_affine")
                       and not getattr(gd, "_int8", False)
                       and (jax.default_backend() == "tpu"
                            or _FORCE_FUSED_TRAIN))
        if fused_train:
            from ..ops.edge_mlp import edge_delta_mlp

            c0, c1 = self.channels
            w0 = _Kernel(c0, name="lin0")(x)
            y = jnp.dot(x.astype(dt), w0.astype(dt))
            y32 = y.astype(jnp.float32)

            # BatchNorm_0 batch moments over the EDGE population via
            # neighbor sums (EdgeMaxMLP's identities), no edge tensor.
            smask = (jnp.ones(gd.nbr_idx.shape, bool)
                     if stats_mask is None else stats_mask)
            # bf16 sum table: halves the one-hot contraction (f32
            # tables pay the hi/lo split); the ~0.4% rounding on the
            # per-point y/y^2 values shifts the batch moments well
            # inside the fused path's documented bf16 tolerance.
            srt = gd.nbr_sum(
                jnp.concatenate([y32, y32 * y32], -1
                                ).astype(jnp.bfloat16), smask)
            s1, s2 = srt[..., :c0], srt[..., c0:]
            cnt = jnp.sum(smask, -1).astype(jnp.float32)[..., None]
            e_total = jnp.maximum(jnp.sum(cnt), 1.0)
            lead = tuple(range(y32.ndim - 1))
            mean0 = jnp.sum(s1 - cnt * y32, axis=lead) / e_total
            sum_h2 = jnp.sum(s2 - 2.0 * y32 * s1 + cnt * y32 * y32,
                             axis=lead)
            var0 = jnp.maximum(sum_h2 / e_total - mean0 * mean0, 0.0)
            inv0, mean0_, bias0 = _BNStateHolder(name="bn0")(
                c0, mean0, var0, True)
            a0 = inv0
            b0 = bias0 - mean0_ * inv0

            w1 = _Kernel(c1, name="lin1")(jnp.zeros((1, c0)))
            # kNN self slot = the zero edge: constant row through the
            # rest of the chain (its b0/W1 gradients flow through this
            # XLA graph via the op's dz0).
            z0 = jnp.dot(leaky_relu02(b0).astype(dt)[None],
                         w1.astype(dt),
                         preferred_element_type=jnp.float32)[0]

            unbatched = gd.nbr_idx.ndim == 2
            yb = (y[None] if unbatched else y).astype(dt)
            idx = gd.nbr_idx[None] if unbatched else gd.nbr_idx
            # K-MAJOR [..., K, N, C1] (the kernel's natural layout; no
            # 100+ MB transpose in either direction).
            y1 = edge_delta_mlp(yb, a0, b0, w1, z0, idx,
                                interpret=_FORCE_FUSED_INTERPRET)
            if unbatched:
                y1 = y1[0]

            # BatchNorm_1 over the edge population (masked like the
            # reference), then LeakyReLU + masked max — all plain XLA
            # autodiff over the single bf16 tensor.
            mask_kn = jnp.swapaxes(gd.nbr_mask, -1, -2)  # [..., K, N]
            y1_32 = y1.astype(jnp.float32)
            m_ = None if stats_mask is None else mask_kn[..., None]
            lead1 = tuple(range(y1_32.ndim - 1))
            mean1 = jnp.mean(y1_32, lead1, where=m_)
            mean1sq = jnp.mean(y1_32 * y1_32, lead1, where=m_)
            var1 = jnp.maximum(mean1sq - mean1 * mean1, 0.0)
            inv1, mean1_, bias1 = _BNStateHolder(name="bn1")(
                c1, mean1, var1, True)
            h1 = leaky_relu02((y1_32 - mean1_) * inv1 + bias1)
            out = _masked_max_kmajor(h1.astype(dt), mask_kn)
            any_valid = jnp.any(gd.nbr_mask, axis=-1)[..., None]
            return jnp.where(any_valid, out, 0.0).astype(dt)

        def pad128_(c):
            return -(-c // 128) * 128

        # Non-centralized deep TRAIN path with a lane-narrower LAST
        # layer: commute it through the max exactly like PointMaxMLP's
        # fused_train branch — per-point prefix layers, then the
        # sign-folded gather-then-matmul kernel at the PREFIX width
        # with the single-winner VJP (the reference's last seg conv
        # gathers 256-wide MLP outputs where its inputs are 128 wide:
        # 6.5 + 5.3 ms of one-hot MXU at k=30/N=2048 halve).
        last_in = self.channels[-2] if len(self.channels) > 1 \
            else x.shape[-1]
        fused_train_nc = (train and not _FORCE_FUSED_OFF
                          and not self.centralized
                          and dt == jnp.bfloat16
                          and hasattr(gd, "nbr_matmul_max_train")
                          and not getattr(gd, "_int8", False)
                          and pad128_(last_in) < pad128_(self.channels[-1])
                          and (_FORCE_FUSED_TRAIN
                               or jax.default_backend() == "tpu"))
        if fused_train_nc:
            from .nonlin import BatchNorm

            h = x
            for i, ch in enumerate(self.channels[:-1]):
                h = lnn.Dense(ch, use_bias=False, dtype=dt,
                              kernel_init=torch_linear_kernel,
                              name=f"lin{i}")(h)
                h = BatchNorm(name=f"bn{i}",
                              axis_name=self.axis_name)(
                    h, train=train, mask=stats_mask)
                h = leaky_relu02(h).astype(dt)
            i_last = len(self.channels) - 1
            w = _Kernel(self.channels[-1], name=f"lin{i_last}")(h)
            # Per-point Dense feeds ONLY the BatchNorm batch moments
            # (see PointMaxMLP's fused_train for the commute proof).
            y = jnp.dot(h, w.astype(dt))
            y32 = y.astype(jnp.float32)
            m_ = stats_mask
            if m_ is not None and m_.ndim == y.ndim - 1:
                m_ = m_[..., None]
            lead = tuple(range(y.ndim - 1))
            mean = jnp.mean(y32, lead, where=m_)
            mean2 = jnp.mean(y32 * y32, lead, where=m_)
            if self.axis_name:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = mean2 - mean * mean
            inv, mean_, bias = _BNStateHolder(name=f"bn{i_last}")(
                self.channels[-1], mean, var, True)
            sign = jnp.where(inv >= 0, 1.0, -1.0)
            wp = (w * sign[None, :]).astype(dt)
            mxp = gd.nbr_matmul_max_train(h, wp)
            y_star = sign * mxp.astype(jnp.float32)
            out = leaky_relu02((y_star - mean_) * inv + bias)
            any_valid = jnp.any(gd.nbr_mask, axis=-1)[..., None]
            return jnp.where(any_valid, out, 0.0).astype(dt)

        ddt = jnp.dtype(self.dtype) if self.dtype else None
        if self.centralized:
            x_j = gd.nbr_gather(x)  # [..., N, K, C]
            h = x_j - x[..., :, None, :]
        else:
            h = x
        for i, ch in enumerate(self.channels):
            h = lnn.Dense(ch, use_bias=False, dtype=ddt,
                          kernel_init=torch_linear_kernel,
                          name=f"lin{i}")(h)
            h = BatchNorm(name=f"bn{i}", axis_name=self.axis_name)(
                h, train=train, mask=stats_mask)
            h = leaky_relu02(h)
            if ddt is not None:
                h = h.astype(ddt)
        if self.centralized:
            return _aggregate(h, gd.nbr_mask, "max")
        return gd.nbr_max(h, self_slot0=True)


class DeltaConv(lnn.Module):
    """One DeltaConv block.

    Attributes:
      out_channels: output width of both streams.
      depth: number of layers in each internal MLP.
      centralized: centralize scalar features before max aggregation
        (used for the first conv operating on raw positions).
      vector: propagate the vector stream (False on the last layer).
      aggr: scalar-stream aggregation ('max', 'mean', 'sum').
    """

    out_channels: int
    depth: int = 1
    centralized: bool = False
    vector: bool = True
    aggr: str = "max"
    # Edge-tensor-free centralized branch (EdgeMaxMLP); exact up to
    # float reassociation. Off-switch exists for A/B testing only.
    fast_centralized: bool = True
    # Mixed precision: bf16 matmuls/activations, f32 BatchNorm stats
    # and parameters ("bfloat16" | None for f32).
    dtype: Optional[str] = None
    # Mesh axis of a sharded point dimension: BatchNorm statistics and
    # edge moments complete with collectives (point-sharded training).
    axis_name: Optional[str] = None

    @lnn.compact
    def __call__(self, x, v, gd: GradDiv, train: bool = False,
                 point_mask=None):
        """Args: ``x [..., N, C]``, ``v [..., N, 2, C]``, ``gd`` the
        (optionally batched) operators, ``point_mask`` optional
        ``[..., N]`` validity (excluded from BatchNorm statistics).
        Returns ``(x', v')``."""
        channels = [self.out_channels] * self.depth
        edge_mask = gd.nbr_mask if point_mask is not None else None

        # Scalar -> scalar aggregation branch. All neighbor access goes
        # through gd's protocol (geometry/nbr_ops.py), so the conv is
        # agnostic to the operator representation (coefficient, dense,
        # or point-sharded).
        if self.centralized:
            if (self.fast_centralized and self.depth == 1
                    and self.aggr == "max"):
                x_max = EdgeMaxMLP(self.out_channels, dtype=self.dtype,
                                   axis_name=self.axis_name,
                                   name="s_mlp_max")(
                    x, gd, train=train, stats_mask=edge_mask)
            elif self.aggr == "max":
                x_max = DeepMaxMLP(channels, centralized=True,
                                   dtype=self.dtype,
                                   axis_name=self.axis_name,
                                   name="s_mlp_max")(
                    x, gd, train=train, stats_mask=edge_mask)
            else:
                x_j = gd.nbr_gather(x)  # [..., N, K, C]
                edge = x_j - x[..., :, None, :]
                h = MLP(channels, dtype=self.dtype, axis_name=self.axis_name,
                        name="s_mlp_max")(edge, train=train,
                                          mask=edge_mask)
                x_max = _aggregate(h, gd.nbr_mask, self.aggr)
        elif self.depth == 1 and self.aggr == "max":
            x_max = PointMaxMLP(self.out_channels, dtype=self.dtype,
                                axis_name=self.axis_name,
                                name="s_mlp_max")(
                x, gd, train=train, stats_mask=point_mask)
        elif self.aggr == "max":
            x_max = DeepMaxMLP(channels, centralized=False,
                               dtype=self.dtype,
                               axis_name=self.axis_name,
                               name="s_mlp_max")(
                x, gd, train=train, stats_mask=point_mask)
        else:
            h = MLP(channels, dtype=self.dtype, axis_name=self.axis_name,
                    name="s_mlp_max")(x, train=train, mask=point_mask)
            h = gd.nbr_gather(h)
            x_max = _aggregate(h, gd.nbr_mask, self.aggr)

        # Operator branch: scalar and vector calculus features.
        # All operator applications are fused into wide matmuls:
        # div([v, Jv]) yields div(v) and -curl(v) in ONE apply (the
        # reference recomputes them as separate sparse matvecs,
        # deltaconv.py:57,66 + operators.py:35-46), and
        # grad([div_v, curl_v]) yields both Hodge-Laplacian terms in
        # one — narrow-column batched matmuls waste the MXU.
        c = x.shape[-1]
        dd = gd.div(jnp.concatenate([v, J(v)], axis=-1))  # [..., 2C]
        div_v = dd[..., :c]
        curl_v = -dd[..., c:]
        x_cat = jnp.concatenate([x, div_v, curl_v, norm(v)], axis=-1)
        x = x_max + MLP(channels, dtype=self.dtype,
                        axis_name=self.axis_name,
                        name="s_mlp")(x_cat, train=train,
                                      mask=point_mask)

        # Vector stream. Both Hodge-Laplacian terms AND grad(x') come
        # from the SAME grad operator, so all three ride ONE 3C-wide
        # apply (one read of the dense W_grad instead of two).
        if self.vector:
            gg = gd.grad(jnp.concatenate([div_v, curl_v, x], axis=-1))
            hodge = -(gg[..., :c] + J(gg[..., c:2 * c]))
            v_cat = jnp.concatenate([v, hodge, gg[..., 2 * c:]], axis=-1)
            v = VectorMLP(channels, dtype=self.dtype,
                          axis_name=self.axis_name,
                          name="v_mlp")(I_J(v_cat), train=train,
                                        mask=point_mask)

        return x, v
