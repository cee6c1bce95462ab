"""Ports of /root/reference/test/nn/test_deltaconv.py: shapes, vector
passthrough, and coordinate-independence of forward AND backward."""

import jax
import jax.numpy as jnp
import numpy as np

from deltaconv_tpu.geometry.connection import rotate_around
from deltaconv_tpu.geometry.frames import estimate_basis
from deltaconv_tpu.geometry.grad_div import build_grad_div
from deltaconv_tpu.geometry.knn import knn
from deltaconv_tpu.nn.deltaconv import DeltaConv


def _setup(rng, n=500, k=20):
    pos = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    nbr_idx, nbr_mask = knn(pos, k)
    normal, xb, yb = estimate_basis(pos, nbr_idx, nbr_mask)
    gd = build_grad_div(pos, normal, xb, yb, nbr_idx, nbr_mask,
                        regularizer=1e-8)
    return pos, normal, xb, yb, nbr_idx, nbr_mask, gd


def test_deltaconv_shapes(rng):
    n, c_out = 500, 32
    pos, _, _, _, _, _, gd = _setup(rng, n)

    v = gd.grad(pos)
    assert v.shape == (n, 2, 3)

    conv = DeltaConv(out_channels=c_out, depth=1, centralized=True,
                     vector=True)
    variables = jax.jit(
        lambda p, vv, g: conv.init(jax.random.PRNGKey(0), p, vv, g,
                                   train=False)
    )(pos, v, gd)
    (x_out, v_out), _ = jax.jit(
        lambda va, p, vv, g: conv.apply(va, p, vv, g, train=True,
                                        mutable=["batch_stats"])
    )(variables, pos, v, gd)
    assert x_out.shape == (n, c_out)
    assert v_out.shape == (n, 2, c_out)

    # vector=False passes v through untouched.
    conv1 = DeltaConv(out_channels=c_out, depth=1, centralized=True,
                      vector=False)
    variables = jax.jit(
        lambda p, vv, g: conv1.init(jax.random.PRNGKey(0), p, vv, g,
                                    train=False)
    )(pos, v, gd)
    (x_out, v_out), _ = jax.jit(
        lambda va, p, vv, g: conv1.apply(va, p, vv, g, train=True,
                                         mutable=["batch_stats"])
    )(variables, pos, v, gd)
    assert x_out.shape == (n, c_out)
    np.testing.assert_allclose(np.asarray(v_out), np.asarray(v))


def test_centralized_fast_path_matches_edge_path(rng):
    """EdgeMaxMLP (edge-tensor-free centralized branch) must equal the
    reference edge-tensor path — same parameter tree, same outputs,
    same gradients, same updated BatchNorm statistics — in train and
    eval mode, with and without a point mask."""
    n, c_out = 200, 16
    pos, _, _, _, nbr_idx, nbr_mask, gd = _setup(rng, n, k=12)
    v = gd.grad(pos)

    fast = DeltaConv(out_channels=c_out, depth=1, centralized=True,
                     fast_centralized=True)
    slow = DeltaConv(out_channels=c_out, depth=1, centralized=True,
                     fast_centralized=False)
    variables = jax.jit(
        lambda p, vv, g: slow.init(jax.random.PRNGKey(0), p, vv, g,
                                   train=False)
    )(pos, v, gd)

    point_mask = np.ones(n, bool)
    point_mask[n - 20:] = False
    point_mask = jnp.asarray(point_mask)

    for train in (False, True):
        for pmask in (None, point_mask):
            def run(model):
                (x_out, _), mut = jax.jit(
                    lambda va, p, vv, g: model.apply(
                        va, p, vv, g, train=train, point_mask=pmask,
                        mutable=["batch_stats"])
                )(variables, pos, v, gd)
                return x_out, mut["batch_stats"]

            xf, bsf = run(fast)
            xs, bss = run(slow)
            np.testing.assert_allclose(np.asarray(xf), np.asarray(xs),
                                       atol=2e-5,
                                       err_msg=f"train={train} "
                                               f"mask={pmask is not None}")
            for lf, ls in zip(jax.tree_util.tree_leaves(bsf),
                              jax.tree_util.tree_leaves(bss)):
                np.testing.assert_allclose(np.asarray(lf), np.asarray(ls),
                                           atol=2e-5)

    # Gradients (train mode, the full stats chain).
    target = jnp.asarray(rng.random((n, c_out)).astype(np.float32))

    def loss_fn(model, params):
        (out, _), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pos, v, gd, train=True, mutable=["batch_stats"])
        return jnp.mean((out - target) ** 2)

    gf = jax.jit(jax.grad(lambda p: loss_fn(fast, p)))(variables["params"])
    gs = jax.jit(jax.grad(lambda p: loss_fn(slow, p)))(variables["params"])
    for lf, ls in zip(jax.tree_util.tree_leaves(gf),
                      jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(lf), np.asarray(ls),
                                   atol=1e-4, rtol=1e-4)


def test_deltaconv_coordinate_independence(rng):
    """Identical forward outputs AND parameter gradients under randomly
    rotated tangent bases (reference test_deltaconv.py:42-74)."""
    n = 500
    pos, normal, xb, yb, nbr_idx, nbr_mask, gd = _setup(rng, n)

    angles = jnp.asarray((rng.random(n) * 2 * np.pi).astype(np.float32))
    xb_rot = rotate_around(xb, normal, angles)
    yb_rot = jnp.cross(normal, xb_rot)
    gd_rot = build_grad_div(pos, normal, xb_rot, yb_rot, nbr_idx, nbr_mask,
                            regularizer=1e-8)

    target = jnp.asarray(rng.random((n, 1)).astype(np.float32))
    conv = DeltaConv(out_channels=1, depth=1, centralized=False)

    v0 = gd.grad(pos)
    variables = jax.jit(
        lambda p, vv, g: conv.init(jax.random.PRNGKey(3), p, vv, g,
                                   train=False)
    )(pos, v0, gd)
    params = variables["params"]
    batch_stats = variables["batch_stats"]

    def loss_fn(params, gd_in):
        v = gd_in.grad(pos)
        (out, _), _ = conv.apply(
            {"params": params, "batch_stats": batch_stats},
            pos, v, gd_in, train=True, mutable=["batch_stats"],
        )
        return jnp.mean(jnp.abs(out - target))

    vag = jax.jit(jax.value_and_grad(loss_fn))
    loss, grads = vag(params, gd)
    loss_rot, grads_rot = vag(params, gd_rot)

    np.testing.assert_allclose(float(loss), float(loss_rot), atol=1e-5)
    flat = jnp.concatenate(
        [g.ravel() for g in jax.tree_util.tree_leaves(grads)]
    )
    flat_rot = jnp.concatenate(
        [g.ravel() for g in jax.tree_util.tree_leaves(grads_rot)]
    )
    np.testing.assert_allclose(
        np.asarray(flat), np.asarray(flat_rot), atol=1e-5
    )


def test_deep_max_mlp_fused_matches_reference(rng, monkeypatch):
    """The depth-2 fused eval path (gather_mlp_max kernel, interpret
    mode) matches the reference pipeline — centralized (edge-tensor
    MLP) and plain (per-point MLP + neighbor max) — on the same
    parameter tree."""
    from deltaconv_tpu.models.deltanet_base import build_operators
    from deltaconv_tpu.nn.deltaconv import DeepMaxMLP

    b, n, k, c = 2, 96, 8, 24
    pos = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
    gd = build_operators(pos, k)

    for centralized in (False, True):
        model = DeepMaxMLP((32, 32), centralized=centralized,
                           dtype="bfloat16")
        variables = model.init(jax.random.PRNGKey(0), x, gd, train=False)
        # Make BatchNorm stats non-trivial (incl. negative-slope
        # channels exercising the sign folding).
        stats = jax.tree.map(
            lambda a: jnp.asarray(
                rng.standard_normal(a.shape).astype(np.float32)),
            variables["batch_stats"])
        stats = jax.tree.map(jnp.abs, stats)  # var > 0
        params = jax.tree.map(
            lambda a: jnp.asarray(
                rng.standard_normal(a.shape).astype(np.float32)),
            variables["params"])
        variables = {"params": params, "batch_stats": stats}

        want = model.apply(variables, x, gd, train=False)

        import deltaconv_tpu.nn.deltaconv as dc

        monkeypatch.setattr(dc, "_FORCE_FUSED_INTERPRET", True)
        got = model.apply(variables, x, gd, train=False)
        monkeypatch.undo()

        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=5e-2, atol=5e-2)


def test_edge_max_fused_epilogue_matches_unfused(rng, monkeypatch):
    """EdgeMaxMLP's eval path with the BN/LeakyReLU epilogue fused
    into the gather kernel (gather_max_affine) is bit-exact vs the
    unfused kernel + XLA epilogue (negative BN slopes exercise the
    sign folding and an all-masked row the zeroing)."""
    import deltaconv_tpu.nn.deltaconv as dc
    from deltaconv_tpu.nn.deltaconv import EdgeMaxMLP

    n, c_out = 200, 24
    pos, _, _, _, _, _, gd = _setup(rng, n, k=12)
    x = jnp.asarray(rng.random((n, 8)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    model = EdgeMaxMLP(c_out, dtype="bfloat16")
    variables = model.init(jax.random.PRNGKey(0), x, gd, train=False)
    stats = jax.tree.map(
        lambda a: jnp.abs(jnp.asarray(
            rng.standard_normal(a.shape).astype(np.float32))),
        variables["batch_stats"])
    params = jax.tree.map(
        lambda a: jnp.asarray(
            rng.standard_normal(a.shape).astype(np.float32)),
        variables["params"])
    variables = {"params": params, "batch_stats": stats}

    want = model.apply(variables, x, gd, train=False)

    monkeypatch.setattr(dc, "_FORCE_FUSED_INTERPRET", True)
    got = model.apply(variables, x, gd, train=False)
    monkeypatch.undo()

    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_point_max_equal_lane_fused_eval_matches_reference(rng,
                                                           monkeypatch):
    """PointMaxMLP's equal-lane eval path (sign-folded max + in-kernel
    BN/LeakyReLU epilogue, engaged when C_in and C_out pad to the same
    lane count) matches the reference pipeline (per-point Dense -> BN
    -> LeakyReLU -> neighbor max) within the eval fast paths' bf16
    tolerance (rounding moves past the max)."""
    import deltaconv_tpu.nn.deltaconv as dc
    from deltaconv_tpu.nn.deltaconv import PointMaxMLP

    n, c_out = 200, 24
    pos, _, _, _, _, _, gd = _setup(rng, n, k=12)
    x = jnp.asarray(rng.random((n, 24)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    model = PointMaxMLP(c_out, dtype="bfloat16")
    variables = model.init(jax.random.PRNGKey(0), x, gd, train=False)
    stats = jax.tree.map(
        lambda a: jnp.abs(jnp.asarray(
            rng.standard_normal(a.shape).astype(np.float32))),
        variables["batch_stats"])
    params = jax.tree.map(
        lambda a: jnp.asarray(
            rng.standard_normal(a.shape).astype(np.float32)),
        variables["params"])
    variables = {"params": params, "batch_stats": stats}

    want = model.apply(variables, x, gd, train=False)

    monkeypatch.setattr(dc, "_FORCE_FUSED_INTERPRET", True)
    got = model.apply(variables, x, gd, train=False)
    monkeypatch.undo()

    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_deep_max_nc_fused_train_matches_reference(rng, monkeypatch):
    """DeepMaxMLP's NON-centralized commuted TRAIN branch (per-point
    prefix layers + the sign-folded gather-then-matmul last layer at
    prefix width — the seg model's last conv) must equal the reference
    pipeline exactly like PointMaxMLP's: same outputs, same parameter
    gradients, same updated BatchNorm statistics."""
    import deltaconv_tpu.nn.deltaconv as dc
    from deltaconv_tpu.nn.deltaconv import DeepMaxMLP

    n = 200
    pos, _, _, _, _, _, gd = _setup(rng, n, k=12)
    x = jnp.asarray(rng.random((n, 6)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    # channels (8, 16): last layer lane-narrower input on real lanes?
    # The gate compares 128-padded widths, so use (120, 200) to make
    # pad128(last_in)=128 < pad128(out)=256.
    model = DeepMaxMLP((120, 200), centralized=False, dtype="bfloat16")
    variables = model.init(jax.random.PRNGKey(0), x, gd, train=False)

    point_mask = np.ones(n, bool)
    point_mask[n - 20:] = False
    point_mask = jnp.asarray(point_mask)

    def run(params, fused, pmask):
        monkeypatch.setattr(dc, "_FORCE_FUSED_TRAIN", fused)
        try:
            out, mut = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                x, gd, train=True, stats_mask=pmask,
                mutable=["batch_stats"])
        finally:
            monkeypatch.undo()
        return out, mut["batch_stats"]

    for pmask in (None, point_mask):
        want, bs_want = run(variables["params"], False, pmask)
        got, bs_got = run(variables["params"], True, pmask)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   atol=2e-5,
                                   err_msg=f"mask={pmask is not None}")
        for lg, lw in zip(jax.tree_util.tree_leaves(bs_got),
                          jax.tree_util.tree_leaves(bs_want)):
            np.testing.assert_allclose(np.asarray(lg), np.asarray(lw),
                                       atol=2e-5)

    target = jnp.asarray(rng.random((n, 200)).astype(np.float32))

    def loss_fn(params, fused):
        monkeypatch.setattr(dc, "_FORCE_FUSED_TRAIN", fused)
        try:
            out, _ = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                x, gd, train=True, mutable=["batch_stats"])
        finally:
            monkeypatch.undo()
        return jnp.mean((out.astype(jnp.float32) - target) ** 2)

    g_want = jax.grad(loss_fn)(variables["params"], False)
    g_got = jax.grad(loss_fn)(variables["params"], True)
    for lg, lw in zip(jax.tree_util.tree_leaves(g_got),
                      jax.tree_util.tree_leaves(g_want)):
        lg, lw = np.asarray(lg, np.float32), np.asarray(lw, np.float32)
        # Near-tie winner flips are a real (documented) deviation: the
        # reference rounds the ACTIVATION to bf16 before its max, which
        # can merge two distinct products into a tie the commuted path
        # does not have — outputs stay equal (same max value), but a
        # sparse set of gradient entries reroute to the other winner.
        # Bound the aggregate effect instead of elementwise equality.
        num = np.linalg.norm(lg - lw)
        den = np.linalg.norm(lw) + 1e-12
        assert num / den < 2e-2, f"relative grad deviation {num/den}"


def test_point_max_fused_train_matches_reference(rng, monkeypatch):
    """PointMaxMLP's commuted TRAIN branch (gather-then-matmul at C_in
    lanes + single-winner VJP, engaged on TPU when C_in is
    lane-narrower than C_out) must equal the reference pipeline
    (per-point Dense -> BatchNorm -> LeakyReLU -> neighbor max) — same
    outputs, same parameter gradients, same updated BatchNorm
    statistics. Forced on here via _FORCE_FUSED_TRAIN, which exercises
    the op's XLA reference path on CPU; the Pallas kernel itself is
    pinned on TPU by tests/ops/test_kernels.py."""
    import deltaconv_tpu.nn.deltaconv as dc
    from deltaconv_tpu.nn.deltaconv import PointMaxMLP

    n, c_out = 200, 16
    pos, _, _, _, _, _, gd = _setup(rng, n, k=12)
    x = jnp.asarray(rng.random((n, 6)).astype(np.float32))

    model = PointMaxMLP(c_out)
    variables = model.init(jax.random.PRNGKey(0), x, gd, train=False)

    point_mask = np.ones(n, bool)
    point_mask[n - 20:] = False
    point_mask = jnp.asarray(point_mask)

    def run(params, fused, pmask):
        monkeypatch.setattr(dc, "_FORCE_FUSED_TRAIN", fused)
        try:
            out, mut = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                x, gd, train=True, stats_mask=pmask,
                mutable=["batch_stats"])
        finally:
            monkeypatch.undo()
        return out, mut["batch_stats"]

    for pmask in (None, point_mask):
        want, bs_want = run(variables["params"], False, pmask)
        got, bs_got = run(variables["params"], True, pmask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5,
                                   err_msg=f"mask={pmask is not None}")
        for lg, lw in zip(jax.tree_util.tree_leaves(bs_got),
                          jax.tree_util.tree_leaves(bs_want)):
            np.testing.assert_allclose(np.asarray(lg), np.asarray(lw),
                                       atol=2e-5)

    # Gradients through the full stats chain (x and params).
    target = jnp.asarray(rng.random((n, c_out)).astype(np.float32))

    def loss_fn(params, xin, fused):
        out, _ = run_grad(params, xin, fused)
        return jnp.mean((out - target) ** 2)

    def run_grad(params, xin, fused):
        monkeypatch.setattr(dc, "_FORCE_FUSED_TRAIN", fused)
        try:
            return model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                xin, gd, train=True, mutable=["batch_stats"])
        finally:
            monkeypatch.undo()

    g_want = jax.grad(loss_fn, argnums=(0, 1))(
        variables["params"], x, False)
    g_got = jax.grad(loss_fn, argnums=(0, 1))(
        variables["params"], x, True)
    for lg, lw in zip(jax.tree_util.tree_leaves(g_got),
                      jax.tree_util.tree_leaves(g_want)):
        np.testing.assert_allclose(np.asarray(lg), np.asarray(lw),
                                   atol=1e-4, rtol=1e-4)
