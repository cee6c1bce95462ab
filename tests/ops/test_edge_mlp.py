"""Fused centralized edge-MLP train op (ops/edge_mlp.py) and its
DeepMaxMLP integration: forward parity, custom-VJP correctness against
autodiff of the reference implementation, and module-level agreement
with the edge-tensor reference path."""

import jax
import jax.numpy as jnp
import numpy as np

from deltaconv_tpu.geometry.frames import estimate_basis
from deltaconv_tpu.geometry.grad_div import build_grad_div
from deltaconv_tpu.geometry.knn import knn
from deltaconv_tpu.ops import edge_mlp as em


def _data(rng, b=2, n=96, k=8, c0=16, c1=12):
    y = jnp.asarray(rng.standard_normal((b, n, c0)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, n, (b, n, k)).astype(np.int32))
    idx = idx.at[..., 0].set(jnp.arange(n)[None])  # self slot 0
    a0 = jnp.asarray(rng.standard_normal(c0).astype(np.float32))
    b0 = jnp.asarray(rng.standard_normal(c0).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((c0, c1)).astype(np.float32))
    z0 = jnp.dot(jnp.where(b0 >= 0, b0, 0.2 * b0).astype(jnp.bfloat16
                                                         )[None],
                 w1.astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32)[0]
    return y, a0, b0, w1, z0, idx


def test_edge_delta_mlp_interpret_matches_reference(rng):
    """Pallas forward (interpret) == the XLA reference bit-for-bit
    (identical rounding points; the gather is exact)."""
    cpu = jax.devices("cpu")[0]
    y, a0, b0, w1, z0, idx = _data(rng)
    with jax.default_device(cpu):
        want = em._reference(y, a0, b0, w1, z0, idx)
        got, y0 = em._pallas_fwd(y, a0, b0, w1, z0, idx, tile=32,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))
    # The stashed residual matches the reference edge values exactly.
    yg = np.asarray(y, np.float32)[np.arange(2)[:, None, None],
                                   np.asarray(idx)]
    y0_ref = (yg - np.asarray(y, np.float32)[:, :, None])[:, :, 1:]
    np.testing.assert_array_equal(
        np.moveaxis(np.asarray(y0), 1, 2)[:, :y0_ref.shape[1]], y0_ref)


def test_edge_delta_mlp_vjp_matches_autodiff(rng):
    """The recompute-in-backward custom VJP == jax.grad of the plain
    reference forward, for every differentiable input. The only
    deliberate deviation is the bf16 rounding of the scattered
    cotangent (the half-width route, ~2^-9 relative on dy)."""
    cpu = jax.devices("cpu")[0]
    y, a0, b0, w1, z0, idx = _data(rng)
    # K-MAJOR target, matching the op's public [B, K, N, C] layout.
    t = jnp.asarray(np.random.default_rng(7).standard_normal(
        (2, 8, 96, 12)).astype(np.float32))

    def loss_plain(args):
        out = em._reference(args[0], args[1], args[2], args[3],
                            args[4], idx).astype(jnp.float32)
        return jnp.sum(out * t)

    def loss_custom(args, interpret):
        out = em.edge_delta_mlp(args[0], args[1], args[2], args[3],
                                args[4], idx, 32, interpret
                                ).astype(jnp.float32)
        return jnp.sum(out * t)

    args = (y, a0, b0, w1, z0)
    with jax.default_device(cpu):
        g_auto = jax.grad(loss_plain)(args)
        legs = [("pallas bwd", jax.grad(lambda a: loss_custom(a, True)
                                        )(args))]
        if jax.default_backend() != "tpu":
            # The non-interpret dispatcher leg routes by the GLOBAL
            # backend; under a TPU backend it would try the real
            # kernel on the pinned CPU device. CPU-only runs cover it.
            legs.append(("reference bwd",
                         jax.grad(lambda a: loss_custom(a, False)
                                  )(args)))

    names = ["dy", "da0", "db0", "dw1", "dz0"]
    for tag, gs in legs:
        for nm, ga, gc in zip(names, g_auto, gs):
            ga = np.asarray(ga, np.float32)
            gc = np.asarray(gc, np.float32)
            # Deliberate deviation from autodiff: the scattered
            # cotangent rounds to bf16 (~2^-9 relative per term, with
            # k-term cancellation) — scale the floor to the tensor.
            atol = 1e-2 * np.abs(ga).max() + 1e-6
            np.testing.assert_allclose(gc, ga, rtol=1e-2, atol=atol,
                                       err_msg=f"{tag} {nm}")


def test_deep_max_fused_train_matches_reference(rng, monkeypatch):
    """DeepMaxMLP's fused centralized depth-2 TRAIN branch vs the
    edge-tensor reference pipeline: outputs and updated BatchNorm
    statistics agree to bf16 commute tolerance (layer 0 commutes
    through the edge difference, so per-edge values differ by one bf16
    rounding), and gradients are finite and flow to every parameter.
    Exact VJP correctness of the kernel is pinned by
    test_edge_delta_mlp_vjp_matches_autodiff."""
    import deltaconv_tpu.nn.deltaconv as dc
    from deltaconv_tpu.nn.deltaconv import DeepMaxMLP

    n, c = 160, 12
    pos = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    nbr_idx, nbr_mask = knn(pos, 10)
    normal, xb, yb = estimate_basis(pos, nbr_idx, nbr_mask)
    gd = build_grad_div(pos, normal, xb, yb, nbr_idx, nbr_mask)
    x = jnp.asarray(rng.random((n, 6)).astype(np.float32))

    model = DeepMaxMLP((c, c), centralized=True, dtype="bfloat16")
    variables = model.init(jax.random.PRNGKey(0), x, gd, train=False)

    point_mask = np.ones(n, bool)
    point_mask[n - 20:] = False
    edge_mask = jnp.asarray(point_mask)[:, None] & nbr_mask

    def run(fused, smask):
        monkeypatch.setattr(dc, "_FORCE_FUSED_TRAIN", fused)
        monkeypatch.setattr(dc, "_FORCE_FUSED_INTERPRET", fused)
        try:
            out, mut = model.apply(
                variables, x, gd, train=True, stats_mask=smask,
                mutable=["batch_stats"])
        finally:
            monkeypatch.undo()
        return out, mut["batch_stats"]

    for smask in (None, edge_mask):
        want, bs_want = run(False, smask)
        got, bs_got = run(True, smask)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=5e-2, atol=5e-2, err_msg=f"mask={smask is not None}")
        for lg, lw in zip(jax.tree_util.tree_leaves(bs_got),
                          jax.tree_util.tree_leaves(bs_want)):
            np.testing.assert_allclose(np.asarray(lg), np.asarray(lw),
                                       rtol=5e-2, atol=5e-2)

    # Gradients through the fused branch: finite, nonzero everywhere.
    def loss_fn(params):
        monkeypatch.setattr(dc, "_FORCE_FUSED_TRAIN", True)
        monkeypatch.setattr(dc, "_FORCE_FUSED_INTERPRET", True)
        try:
            out, _ = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                x, gd, train=True, mutable=["batch_stats"])
        finally:
            monkeypatch.undo()
        return jnp.mean(out.astype(jnp.float32) ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
        arr = np.asarray(leaf, np.float32)
        assert np.all(np.isfinite(arr)), path
        assert np.any(arr != 0), f"zero grad at {path}"
