"""Point-sharded operators and model forward (the SP analog).

For clouds too large for one chip, the N points of a single cloud are
sharded over the mesh (SURVEY.md §2.7's "point/graph parallelism"):

* every device owns a contiguous row block of positions/features;
* kNN runs locally against an all-gathered position table (positions
  are 12 bytes/point — gathering them is cheap; features are not);
* each device builds the MLS operators for ITS points only through
  the SAME ``build_grad_div_tables`` core the single-chip build uses
  (geometry/grad_div.py), with psum/pmax hooks completing the
  per-cloud mean edge length and infinity norm;
* operator application and the scalar-stream neighbor max all-gather
  the feature table once per use (the unavoidable halo: neighborhoods
  are arbitrary), contract locally, and leave results sharded —
  exposed to the conv stack through the neighbor protocol
  (geometry/nbr_ops.py) via :class:`ShardedGradDiv`, so the full
  DeltaConv/DeltaNet forward runs point-sharded unchanged.

Everything is expressed with ``shard_map`` + ``jax.lax`` collectives
over ICI; XLA schedules the all-gathers.

Training works too (:func:`point_sharded_train_step`): BatchNorm
statistics and the centralized conv's edge moments psum over the
mesh axis (``point_axis_name`` plumbed through the modules), the
replicated loss differentiates through the collectives, and parameter
gradients psum before the optimizer update — one step matches the
single-device step exactly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..geometry.frames import build_tangent_basis, estimate_basis
from ..geometry.grad_div import GradDiv, build_grad_div_tables

__all__ = [
    "ShardedGradDiv",
    "point_sharded_operators",
    "point_sharded_grad",
    "point_sharded_div",
    "point_sharded_laplacian",
    "point_sharded_classification",
    "point_sharded_segmentation",
    "pad_cloud",
]

_NEG = -3.0e38


# Above this table length the local kNN switches to the tiled sweep
# (O(n_local * _KNN_TILE) memory instead of the full [n_local, N_total]
# distance block — point sharding exists for clouds where the latter
# cannot fit). Tests shrink it to exercise the tiled path at small N.
_KNN_TILE = 4096

# Above this table length the TPU path further switches from the
# quadratic column sweep to the Morton-bucketed candidate sweep
# (ops/knn_bucketed.py — the TPU-native analog of the reference's
# KD-tree candidate generation, cpp/sampling.cpp:5-17): ~10x less
# sweep work at 65k points. Exact mode stays exact through the
# certificate + repair + fallback chain; approx mode documents ~0.995
# recall at the bench operating point. Tests shrink it.
_KNN_BUCKETED_MIN = 16384
# Test hook: take the bucketed branch on CPU backends in Pallas
# interpret mode (integration coverage of the sharded build with the
# bucketed kNN — the branch is otherwise TPU-only). Never set in
# production.
_FORCE_BUCKETED_INTERPRET = False


def _knn_scores(pos_q, sq_q, pos_t, sq_t, rows, cols,
                point_mask_t=None):
    """Similarity block (-d^2, self pinned to +2e30, masked cols to
    -2e30) between query rows and a table block."""
    s = 2.0 * jnp.dot(
        pos_q, pos_t.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) - sq_q[:, None] - sq_t[None, :]
    s = jnp.where(rows[:, None] == cols[None, :], 2e30, s)
    if point_mask_t is not None:
        s = jnp.where(point_mask_t[None, :], s, -2e30)
    return s


def _local_knn(pos_local, pos_full, k, offset, point_mask_full=None,
               quantized=False):
    """Top-k neighbors of local rows against the full table.

    Returns global indices with the self-loop pinned to slot 0; masked
    table rows are never selected (as long as k <= #valid points).
    Tables longer than ``_KNN_TILE`` run a tiled column sweep with a
    running top-k merge (exact, ties broken toward lower indices like
    ``lax.top_k``), so memory stays O(n_local * (tile + k)).
    ``quantized=True`` (the sharded analog of the headline's
    ``knn_method="approx"``) runs the tiled sweep with packed 16-bit
    keys — ~1.5x faster, ordering exact at per-tile 16-bit score
    granularity; the short-table and XLA fallbacks stay exact either
    way.
    """
    n_local = pos_local.shape[0]
    n_full = pos_full.shape[0]
    sq_l = jnp.sum(pos_local * pos_local, axis=-1)
    rows = offset + jnp.arange(n_local)

    if n_full <= max(_KNN_TILE, 2 * k):
        sq_f = jnp.sum(pos_full * pos_full, axis=-1)
        s = _knn_scores(pos_local, sq_l, pos_full, sq_f, rows,
                        jnp.arange(n_full), point_mask_full)
        _, idx = jax.lax.top_k(s, k)
        return idx.astype(jnp.int32)

    if jax.default_backend() == "tpu" or _FORCE_BUCKETED_INTERPRET:
        if n_full >= _KNN_BUCKETED_MIN or _FORCE_BUCKETED_INTERPRET:
            # Morton-bucketed candidate sweep (ops/knn_bucketed.py):
            # each query row sweeps only the nearest spatial buckets.
            # Exact mode certifies per row and repairs/falls back, so
            # winner SETS still match the quadratic sweep; approx mode
            # is the recall-documented packed-key variant.
            from ..ops.knn_bucketed import knn_topk_bucketed
            # Test-hook path shrinks the tiles to interpret-mode sizes;
            # production keeps the tuned defaults.
            kw = (dict(tile_q=32, tile_c=128, interpret=True)
                  if _FORCE_BUCKETED_INTERPRET else {})
            return knn_topk_bucketed(pos_local, pos_full, k,
                                     row_offset=offset,
                                     point_mask=point_mask_full,
                                     quantized=quantized, **kw)

        # Column-tiled Pallas sweep: the [n_local, tile] score plane
        # stays in VMEM with a running top-k scratch (ops/knn_topk.py
        # knn_topk_table) — winner sets match the XLA scan below
        # bit-for-bit (same score expression, same tie-breaks), at a
        # fraction of its lax.top_k-per-tile cost.
        from ..ops.knn_topk import knn_topk_table
        return knn_topk_table(pos_local, pos_full, k, row_offset=offset,
                              point_mask=point_mask_full,
                              quantized=quantized)

    tile = _KNN_TILE
    pad = (-n_full) % tile
    pos_p = jnp.pad(pos_full, ((0, pad), (0, 0)))
    pm_p = jnp.arange(n_full + pad) < n_full
    if point_mask_full is not None:
        pm_p = pm_p & jnp.pad(point_mask_full, (0, pad))
    sq_p = jnp.sum(pos_p * pos_p, axis=-1)

    def body(carry, c_start):
        best_s, best_i = carry
        blk = jax.lax.dynamic_slice(pos_p, (c_start, 0), (tile, 3))
        sq_b = jax.lax.dynamic_slice(sq_p, (c_start,), (tile,))
        pm_b = jax.lax.dynamic_slice(pm_p, (c_start,), (tile,))
        cols = c_start + jnp.arange(tile)
        s = _knn_scores(pos_local, sq_l, blk, sq_b, rows, cols, pm_b)
        cand_s, cand_j = jax.lax.top_k(s, k)
        cand_i = c_start + cand_j
        # Merge with the running top-k; candidates keep ascending-
        # index order inside equal scores (stable top_k + blocks
        # arriving in index order), matching the dense path's ties.
        all_s = jnp.concatenate([best_s, cand_s], axis=-1)
        all_i = jnp.concatenate([best_i, cand_i], axis=-1)
        best_s, pos = jax.lax.top_k(all_s, k)
        best_i = jnp.take_along_axis(all_i, pos, axis=-1)
        return (best_s, best_i), None

    init = (jnp.full((n_local, k), -3e38, jnp.float32),
            jnp.zeros((n_local, k), jnp.int32))
    (best_s, best_i), _ = jax.lax.scan(
        body, init, jnp.arange(0, n_full + pad, tile))
    return best_i.astype(jnp.int32)


class ShardedGradDiv:
    """Neighbor protocol over a point-sharded cloud.

    Wraps a local :class:`GradDiv` (rows = this shard's points,
    ``nbr_idx`` global) inside a ``shard_map`` body; every gather
    all-gathers the feature table over ``axis`` and contracts locally.
    Implements the same surface the conv stack uses on ``GradDiv`` /
    ``DenseGradDiv`` (geometry/nbr_ops.py).
    """

    def __init__(self, gd: GradDiv, axis: str):
        self.local = gd
        self.axis = axis

    @property
    def nbr_idx(self):
        return self.local.nbr_idx

    @property
    def nbr_mask(self):
        return self.local.nbr_mask

    def _full(self, h):
        return jax.lax.all_gather(h, self.axis, axis=0, tiled=True)

    def _coef_contract(self, coef, g, pattern):
        """Contract the f32 coefficient tables with gathered per-edge
        features WITHOUT materializing an f32 copy of the edge tensor
        — at N=65,536 the edge tensors are GB-scale and the promote
        convert alone traced at 13 ms/step (2026-08-20 op trace).
        bf16 features contract against a hi/lo bf16 split of the
        coefficients: hi+lo carries ~2^-17 relative representation
        error vs f32's 2^-24 (each bf16 half keeps 8 mantissa bits),
        and each bf16*bf16 product is exact in the f32 accumulator —
        ~1e-5 relative vs the f32*f32 reference plus the usual K-sum
        reassociation, well inside the suite's 2e-4 tolerance."""
        if g.dtype == jnp.bfloat16:
            hi = jax.lax.optimization_barrier(
                coef.astype(jnp.bfloat16))
            lo = (coef - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return (jnp.einsum(pattern, hi, g,
                               preferred_element_type=jnp.float32)
                    + jnp.einsum(pattern, lo, g,
                                 preferred_element_type=jnp.float32))
        return jnp.einsum(pattern, coef, g,
                          precision=jax.lax.Precision.HIGHEST)

    def grad(self, x):
        xg = self._full(x)[self.nbr_idx]  # [n_l, K, C], x's dtype
        return self._coef_contract(self.local.grad_coef, xg,
                                   "nkd,nkc->ndc").astype(x.dtype)

    def div(self, v):
        vg = self._full(v)[self.nbr_idx]  # [n_l, K, 2, C]
        return self._coef_contract(self.local.div_coef, vg,
                                   "nkd,nkdc->nc").astype(v.dtype)

    def _gathered(self, table):
        """Indexes an already-FULL table into masked-ready neighbor
        values ``[n_l, K, C]`` (callers that hold the full table must
        NOT route through :meth:`_full` again — a D-fold buffer
        blow-up). bf16 tables gather as bf16 — the cast to f32 is
        value-preserving, so max/min results are identical while the
        materialized edge tensor halves."""
        g = table[self.nbr_idx]
        return g if g.dtype == jnp.bfloat16 else g.astype(jnp.float32)

    def _max_of(self, g):
        # dtype-matched sentinel: a Python-float -3e38 would promote
        # the whole bf16 edge tensor back to f32.
        neg = jnp.asarray(_NEG, g.dtype)
        return jnp.max(jnp.where(self.nbr_mask[..., None], g, neg),
                       axis=-2)

    def _min_of(self, g):
        pos = jnp.asarray(-_NEG, g.dtype)
        return jnp.min(jnp.where(self.nbr_mask[..., None], g, pos),
                       axis=-2)

    def _matmul_full(self, x, w):
        return jnp.dot(self._full(x), w,
                       preferred_element_type=jnp.float32).astype(x.dtype)

    def nbr_max(self, h, self_slot0: bool = True):
        out = self._max_of(self._gathered(self._full(h)))
        any_valid = jnp.any(self.nbr_mask, axis=-1)[..., None]
        return jnp.where(any_valid, out, 0.0).astype(h.dtype)

    def nbr_minmax(self, h, self_slot0: bool = True):
        g = self._gathered(self._full(h))
        mx, mn = self._max_of(g), self._min_of(g)
        if h.dtype == jnp.bfloat16:
            mx, mn = mx.astype(h.dtype), mn.astype(h.dtype)
        return mx, mn

    def nbr_matmul_minmax(self, x, w, self_slot0: bool = True):
        g = self._gathered(self._matmul_full(x, w))
        mx, mn = self._max_of(g), self._min_of(g)
        if x.dtype == jnp.bfloat16:
            mx, mn = mx.astype(x.dtype), mn.astype(x.dtype)
        return mx, mn

    def nbr_matmul_max(self, x, w, self_slot0: bool = True):
        out = self._max_of(self._gathered(self._matmul_full(x, w)))
        return out.astype(x.dtype)

    def nbr_sum(self, h, mask=None):
        mask = self.nbr_mask if mask is None else mask
        g = self._full(h)[self.nbr_idx].astype(jnp.float32)
        return jnp.sum(g * mask[..., None].astype(jnp.float32), axis=-2)

    def gather(self, h):
        return self._full(h)[self.nbr_idx]

    # The sharded gather is already collective-based; the Pallas
    # one-hot dispatch does not apply inside the shard_map body.
    nbr_gather = gather


def _build_local(pos_l, normal_l, pm_l, k, axis, kernel_width,
                 regularizer, normal_k=10, knn_method="exact"):
    """shard_map body: local rows of the operators for one cloud."""
    quant = knn_method == "approx"
    ax = jax.lax.axis_index(axis)
    n_local = pos_l.shape[0]
    offset = ax * n_local
    pos_full = jax.lax.all_gather(pos_l, axis, axis=0, tiled=True)
    pm_full = None
    if pm_l is not None:
        pm_full = jax.lax.all_gather(pm_l, axis, axis=0, tiled=True)

    nbr_idx = _local_knn(pos_l, pos_full, k, offset, pm_full,
                         quantized=quant)
    if normal_l is None:
        # Mirror the single-chip path (deltanet_base.py:63-65): a
        # normal_k-NN graph — NOT clamped by the conv's k — and the
        # padded-neighbor mask, so estimated frames match the
        # single-device forward exactly.
        nbr_n = _local_knn(pos_l, pos_full, normal_k, offset, pm_full,
                           quantized=quant)
        mask_n = None if pm_full is None else pm_full[nbr_n]
        n_, xb, yb = estimate_basis(pos_l, nbr_n, mask_n,
                                    orientation=pos_l, table=pos_full)
    else:
        n_ = normal_l
        xb, yb = build_tangent_basis(n_)

    # Frames of the NEIGHBORS are needed for the vector mapping:
    # all-gather the (cheap, 6-float) frame tables.
    xb_full = jax.lax.all_gather(xb, axis, axis=0, tiled=True)
    yb_full = jax.lax.all_gather(yb, axis, axis=0, tiled=True)

    nbr_mask = None
    if pm_full is not None:
        nbr_mask = pm_full[nbr_idx]

    def avg_reduce(s, c):
        return (jax.lax.psum(s, axis)
                / jnp.maximum(jax.lax.psum(c, axis), 1.0))

    gd = build_grad_div_tables(
        pos_full, xb_full, yb_full, pos_l, n_, xb, yb, nbr_idx,
        nbr_mask=nbr_mask, point_mask=pm_l,
        kernel_width=kernel_width, regularizer=regularizer,
        avg_reduce=avg_reduce,
        max_reduce=lambda m: jax.lax.pmax(m, axis),
    )
    return gd


def point_sharded_operators(mesh: Mesh, pos, k: int, normal=None,
                            point_mask=None, axis: str = "points",
                            kernel_width: float = 1.0,
                            regularizer: float = 0.001,
                            knn_method: str = "exact") -> GradDiv:
    """Builds row-sharded grad/div operators for ONE large cloud.

    Args:
      mesh: 1-D mesh with axis ``axis``.
      pos: ``[N, 3]`` (sharded or shardable on axis 0; N divisible by
        the mesh size — :func:`pad_cloud` pads arbitrary N).
      k: neighbors (incl. self).
      normal: optional ``[N, 3]`` unit normals.
      point_mask: optional ``[N]`` bool validity (padded points).

    Returns:
      :class:`GradDiv` whose arrays are sharded on axis 0;
      ``nbr_idx`` holds GLOBAL point indices.
    """

    def build(pos_l, normal_l, pm_l):
        return _build_local(pos_l, normal_l, pm_l, k, axis,
                            kernel_width, regularizer,
                            knn_method=knn_method)

    spec_in = (P(axis), None if normal is None else P(axis),
               None if point_mask is None else P(axis))
    out_spec = GradDiv(nbr_idx=P(axis), nbr_mask=P(axis),
                       grad_coef=P(axis), div_coef=P(axis))
    return jax.shard_map(
        build, mesh=mesh, in_specs=spec_in, out_specs=out_spec,
        check_vma=False,
    )(pos, normal, point_mask)


def _sharded_apply(mesh, axis, fn, gd, x):
    specs = GradDiv(nbr_idx=P(axis), nbr_mask=P(axis),
                    grad_coef=P(axis), div_coef=P(axis))
    return jax.shard_map(
        fn, mesh=mesh, in_specs=(specs, P(axis)), out_specs=P(axis),
        check_vma=False,
    )(gd, x)


def point_sharded_grad(mesh: Mesh, gd: GradDiv, x, axis: str = "points"):
    """``[N, C] (sharded) -> [N, 2, C]`` (sharded)."""
    return _sharded_apply(
        mesh, axis, lambda g, xl: ShardedGradDiv(g, axis).grad(xl), gd, x)


def point_sharded_div(mesh: Mesh, gd: GradDiv, v, axis: str = "points"):
    """``[N, 2, C] (sharded) -> [N, C]`` (sharded)."""
    return _sharded_apply(
        mesh, axis, lambda g, vl: ShardedGradDiv(g, axis).div(vl), gd, v)


def point_sharded_laplacian(mesh: Mesh, pos, x, k: int, normal=None,
                            axis: str = "points"):
    """Sharded build + ``-div(grad(x))`` on one large cloud. All
    arrays sharded on axis 0 of the ``axis`` mesh dim."""
    gd = point_sharded_operators(mesh, pos, k, normal=normal, axis=axis)
    g = point_sharded_grad(mesh, gd, x, axis=axis)
    return -point_sharded_div(mesh, gd, g, axis=axis)


def pad_cloud(pos, n_devices, normal=None):
    """Pads ``[N, 3]`` arrays to a multiple of ``n_devices`` rows and
    returns ``(pos, normal, point_mask)`` — the SP entry for arbitrary
    N."""
    n = pos.shape[0]
    pad = (-n) % n_devices
    mask = jnp.arange(n + pad) < n
    if pad:
        pos = jnp.pad(pos, ((0, pad), (0, 0)))
        if normal is not None:
            # Unit z keeps build_tangent_basis well-defined on padding.
            normal = jnp.concatenate(
                [normal, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]],
                                              normal.dtype), (pad, 1))])
    return pos, normal, mask


def _point_sharded_forward(mesh, model, variables, pos, normal,
                           point_mask, axis, out_spec, **apply_kwargs):
    """Eval forward of a DeltaNet model on ONE point-sharded cloud."""
    model = model.clone(point_axis_name=axis)

    def fwd(vars_, pos_l, normal_l, pm_l):
        gd = _build_local(pos_l, normal_l, pm_l, model.num_neighbors,
                          axis, model.grad_kernel_width,
                          model.grad_regularizer,
                          knn_method=model.knn_method)
        sgd = ShardedGradDiv(gd, axis)
        return model.apply(vars_, pos_l, normal=normal_l,
                           point_mask=pm_l, train=False, operators=sgd,
                           **apply_kwargs)

    var_spec = jax.tree.map(lambda _: P(), variables)
    spec_in = (var_spec, P(axis),
               None if normal is None else P(axis),
               None if point_mask is None else P(axis))
    return jax.shard_map(
        fwd, mesh=mesh, in_specs=spec_in, out_specs=out_spec,
        check_vma=False,
    )(variables, pos, normal, point_mask)


def point_sharded_classification(mesh: Mesh, model, variables, pos,
                                 normal=None, point_mask=None,
                                 axis: str = "points"):
    """Eval logits of ``DeltaNetClassification`` for ONE cloud whose
    points are sharded over ``mesh``: the full conv stack runs on local
    rows through :class:`ShardedGradDiv`; global pools complete with
    pmax/psum, so the returned ``[num_classes]`` logits are replicated.
    """
    return _point_sharded_forward(mesh, model, variables, pos, normal,
                                  point_mask, axis, P())


def point_sharded_train_step(mesh: Mesh, model, axis: str = "points",
                             smoothing: float = 0.2,
                             per_point: bool = False):
    """Returns ``step(state, pos, normal, label, rng, point_mask=None,
    category=None) -> (state, metrics)`` training a DeltaNet model on
    ONE cloud whose points are sharded over ``mesh``.

    Inside ``shard_map``: the operator build and conv stack run on
    local rows (collective-backed statistics via ``point_axis_name``)
    and the parameter gradients complete across shards before
    ``apply_gradients`` (parameters stay replicated). Matches the
    single-device ``make_train_step`` update exactly for the same
    cloud.

    Gradient completion is a ``pmean`` for both heads: every shard's
    backward sees the full loss ``n_shards``-fold — classification
    because the replicated loss is redundantly recomputed per shard,
    segmentation because the loss's ``psum`` transposes to another
    ``psum`` (each shard's replicated cotangent is summed) — so each
    shard's local gradient is ``n_shards`` times its true share and
    the mean across shards restores the single-device gradient
    (verified against ``make_train_step`` in the tests).
    """
    from ..training.losses import smooth_cross_entropy, smooth_nll

    model = model.clone(point_axis_name=axis)

    def fwd(params, batch_stats, pos_l, normal_l, pm_l, label, rng,
            cat):
        if per_point:
            # Segmentation dropout acts on PER-POINT (sharded) rows:
            # fold in the shard index so masks are independent across
            # shards (one shared rng would tie row i of every shard to
            # the same mask — the wrong dropout distribution).
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        # Classification dropout acts on the post-pool REPLICATED
        # stream: every shard must draw the SAME mask (a per-shard
        # fold_in would diverge logits/loss/head batch_stats that the
        # out_specs declare replicated) — and the pooled shapes match
        # the single-device step, so parity is exact there.

        def loss_fn(p):
            gd = _build_local(pos_l, normal_l, pm_l,
                              model.num_neighbors, axis,
                              model.grad_kernel_width,
                              model.grad_regularizer,
                              knn_method=model.knn_method)
            kwargs = {} if cat is None else {"category": cat}
            logits, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                pos_l, normal=normal_l, point_mask=pm_l, train=True,
                operators=ShardedGradDiv(gd, axis),
                mutable=["batch_stats"], rngs={"dropout": rng},
                **kwargs,
            )
            if per_point:
                # label: [n_local] rows of this shard. Masked local
                # sum of the shared per-element nll, completed with
                # psums (the smoothing convention lives in ONE place:
                # training.losses.smooth_nll).
                nll = smooth_nll(logits, label, smoothing)
                m = (jnp.ones_like(nll) if pm_l is None
                     else pm_l.astype(nll.dtype))
                s = jax.lax.psum(jnp.sum(nll * m), axis)
                cnt = jax.lax.psum(jnp.sum(m), axis)
                loss = s / jnp.maximum(cnt, 1.0)
            else:
                loss = smooth_cross_entropy(logits[None], label[None],
                                            smoothing)
            return loss, (logits, mutated["batch_stats"])

        (loss, (logits, bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, axis), grads)
        return loss, logits, bs, grads

    def rep(x):
        return jax.tree.map(lambda _: P(), x)

    def step(state, pos, normal, label, rng, point_mask=None,
             category=None):
        logits_spec = P(axis) if per_point else P()
        loss, logits, bs, grads = jax.shard_map(
            fwd, mesh=mesh,
            in_specs=(rep(state.params), rep(state.batch_stats),
                      P(axis), None if normal is None else P(axis),
                      None if point_mask is None else P(axis),
                      P(axis) if per_point else P(), P(),
                      None if category is None else P()),
            out_specs=(P(), logits_spec, rep(state.batch_stats),
                       rep(state.params)),
            check_vma=False,
        )(state.params, state.batch_stats, pos, normal, point_mask,
          label, rng, category)
        state = state.apply_gradients(grads=grads, batch_stats=bs)
        pred = jnp.argmax(logits, axis=-1)
        if per_point:
            m = (jnp.ones_like(label, jnp.float32) if point_mask is None
                 else point_mask.astype(jnp.float32))
            acc = (jnp.sum((pred == label) * m)
                   / jnp.maximum(jnp.sum(m), 1.0))
        else:
            acc = (pred == label).astype(jnp.float32)
        return state, {"loss": loss, "accuracy": acc}

    return step


def point_sharded_segmentation(mesh: Mesh, model, variables, pos,
                               normal=None, point_mask=None,
                               category=None, axis: str = "points"):
    """Per-point eval logits of ``DeltaNetSegmentation`` for ONE
    sharded cloud; the ``[N, num_classes]`` output stays sharded."""
    kwargs = {} if category is None else {"category": category}
    return _point_sharded_forward(mesh, model, variables, pos, normal,
                                  point_mask, axis, P(axis), **kwargs)
