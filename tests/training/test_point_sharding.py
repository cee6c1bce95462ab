"""Point-sharded operators must match the single-device build."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deltaconv_tpu.geometry.frames import build_tangent_basis
from deltaconv_tpu.geometry.grad_div import build_grad_div
from deltaconv_tpu.geometry.knn import knn
from deltaconv_tpu.geometry.operators import laplacian
from deltaconv_tpu.parallel.point_sharding import (
    point_sharded_laplacian,
    point_sharded_operators,
)
from jax.sharding import Mesh


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_point_sharded_matches_single_device(rng):
    n, k = 512, 12
    pos = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    nrm = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    x = jnp.asarray(rng.random((n, 4)).astype(np.float32))

    # Single device reference.
    nbr, mask = knn(pos, k)
    xb, yb = build_tangent_basis(nrm)
    gd = build_grad_div(pos, nrm, xb, yb, nbr, mask)
    want = np.asarray(laplacian(x, gd))

    mesh = Mesh(np.asarray(jax.devices()), ("points",))
    got = np.asarray(
        point_sharded_laplacian(mesh, pos, x, k, normal=nrm)
    )
    np.testing.assert_allclose(got, want, atol=5e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_point_sharded_estimated_normals(rng):
    n, k = 256, 10
    pos = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    mesh = Mesh(np.asarray(jax.devices()), ("points",))
    gd = point_sharded_operators(mesh, pos, k)
    assert gd.grad_coef.shape == (n, k, 2)
    assert np.all(np.isfinite(np.asarray(gd.grad_coef)))
    # Global indices may exceed the local shard size.
    assert int(jnp.max(gd.nbr_idx)) >= n // 8


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_point_sharded_classification_matches_single_device(rng):
    """The FULL conv stack + heads point-sharded over 8 devices must
    reproduce the single-device eval logits."""
    from deltaconv_tpu.models import DeltaNetClassification
    from deltaconv_tpu.parallel.point_sharding import (
        point_sharded_classification,
    )

    n, k = 256, 12
    pos = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    nrm = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)

    model = DeltaNetClassification(
        num_classes=6, conv_channels=(16, 16, 32), num_neighbors=k,
        dense_operators=False,
    )
    variables = model.init(jax.random.PRNGKey(0), pos[None],
                           normal=nrm[None], train=False)
    want = np.asarray(model.apply(variables, pos[None], normal=nrm[None],
                                  train=False))[0]

    mesh = Mesh(np.asarray(jax.devices()), ("points",))
    got = np.asarray(point_sharded_classification(
        mesh, model, variables, pos, normal=nrm))
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_point_sharded_padded_cloud_matches(rng):
    """Arbitrary N: pad_cloud pads to the mesh size with a point_mask;
    logits must match the UNPADDED single-device run."""
    from deltaconv_tpu.models import DeltaNetClassification
    from deltaconv_tpu.parallel.point_sharding import (
        pad_cloud,
        point_sharded_classification,
    )

    n, k = 300, 10
    pos = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    nrm = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)

    model = DeltaNetClassification(
        num_classes=5, conv_channels=(16, 16), num_neighbors=k,
        dense_operators=False,
    )
    variables = model.init(jax.random.PRNGKey(0), pos[None],
                           normal=nrm[None], train=False)
    want = np.asarray(model.apply(variables, pos[None], normal=nrm[None],
                                  train=False))[0]

    mesh = Mesh(np.asarray(jax.devices()), ("points",))
    pos_p, nrm_p, mask = pad_cloud(pos, 8, nrm)
    assert pos_p.shape[0] == 304 and int(mask.sum()) == n
    got = np.asarray(point_sharded_classification(
        mesh, model, variables, pos_p, normal=nrm_p, point_mask=mask))
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_point_sharded_segmentation_matches(rng):
    from deltaconv_tpu.models import DeltaNetSegmentation
    from deltaconv_tpu.parallel.point_sharding import (
        point_sharded_segmentation,
    )

    n, k = 256, 10
    pos = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    nrm = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    cat = jnp.zeros((16,)).at[3].set(1.0)

    model = DeltaNetSegmentation(
        num_classes=7, conv_channels=(16, 16), mlp_depth=1,
        embedding_size=32, categorical_vector=True, num_neighbors=k,
        dense_operators=False,
    )
    variables = model.init(jax.random.PRNGKey(0), pos[None],
                           normal=nrm[None], category=cat[None],
                           train=False)
    want = np.asarray(model.apply(
        variables, pos[None], normal=nrm[None], category=cat[None],
        train=False))[0]

    mesh = Mesh(np.asarray(jax.devices()), ("points",))
    got = np.asarray(point_sharded_segmentation(
        mesh, model, variables, pos, normal=nrm, category=cat))
    assert got.shape == (n, 7)
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("dropout", [0.0, 0.5])
def test_point_sharded_train_step_matches_single_device(rng, dropout):
    """ONE training step (operator build + fwd + bwd + update) on a
    point-sharded cloud must reproduce the single-device step: psum'd
    BatchNorm/edge statistics, pmean'd parameter gradients.

    dropout=0.5 pins the replicated-stream rng rule: classification
    dropout acts POST-POOL, so every shard must draw the same mask
    (a per-shard fold_in once diverged logits/loss across shards)."""
    from deltaconv_tpu.models import DeltaNetClassification
    from deltaconv_tpu.parallel.point_sharding import (
        point_sharded_train_step,
    )
    from deltaconv_tpu.training import (
        create_train_state,
        make_train_step,
        sgd_momentum,
    )

    n, k = 256, 12
    pos = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    nrm = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    label = jnp.asarray([2], jnp.int32)

    model = DeltaNetClassification(
        num_classes=5, conv_channels=(16, 16), num_neighbors=k,
        dense_operators=False, dropout=dropout,
    )
    state = create_train_state(
        model, jax.random.PRNGKey(0), (pos[None],), sgd_momentum(0.05),
        init_kwargs={"normal": nrm[None]},
    )

    # Single-device reference step on the same one-cloud batch.
    ref_step = make_train_step(model, smoothing=0.2)
    ref_state, ref_metrics = ref_step(
        state, {"pos": pos[None], "normal": nrm[None], "label": label},
        jax.random.PRNGKey(7))

    mesh = Mesh(np.asarray(jax.devices()), ("points",))
    sp_step = point_sharded_train_step(mesh, model, smoothing=0.2)
    sp_state, sp_metrics = sp_step(state, pos, nrm, label[0],
                                   jax.random.fold_in(
                                       jax.random.PRNGKey(7), 0))

    np.testing.assert_allclose(float(sp_metrics["loss"]),
                               float(ref_metrics["loss"]), atol=1e-5)

    flat_ref = jax.tree_util.tree_leaves_with_path(ref_state.params)
    flat_sp = dict(jax.tree_util.tree_leaves_with_path(sp_state.params))
    for path, want in flat_ref:
        got = flat_sp[path]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, err_msg=str(path))

    flat_ref = jax.tree_util.tree_leaves_with_path(ref_state.batch_stats)
    flat_sp = dict(
        jax.tree_util.tree_leaves_with_path(sp_state.batch_stats))
    for path, want in flat_ref:
        got = flat_sp[path]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, err_msg=str(path))


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_point_sharded_seg_train_step_matches_single_device(rng):
    """ONE segmentation training step on a point-sharded cloud must
    reproduce the single-device step (psum'd per-point loss, pmean'd
    parameter gradients, psum'd BatchNorm statistics)."""
    from deltaconv_tpu.models import DeltaNetSegmentation
    from deltaconv_tpu.parallel.point_sharding import (
        point_sharded_train_step,
    )
    from deltaconv_tpu.training import (
        create_train_state,
        make_train_step,
        sgd_momentum,
    )

    n, k = 256, 10
    pos = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    nrm = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    cat = jnp.zeros((16,)).at[3].set(1.0)
    label = jnp.asarray(rng.integers(0, 7, size=(n,)), jnp.int32)

    model = DeltaNetSegmentation(
        num_classes=7, conv_channels=(16, 16), mlp_depth=1,
        embedding_size=32, categorical_vector=True, num_neighbors=k,
        dense_operators=False, dropout=0.0,
    )
    state = create_train_state(
        model, jax.random.PRNGKey(0), (pos[None],), sgd_momentum(0.05),
        init_kwargs={"normal": nrm[None], "category": cat[None]},
    )

    ref_step = make_train_step(model, smoothing=0.2, per_point=True)
    ref_state, ref_metrics = ref_step(
        state, {"pos": pos[None], "normal": nrm[None],
                "label": label[None], "category": cat[None]},
        jax.random.PRNGKey(7))

    mesh = Mesh(np.asarray(jax.devices()), ("points",))
    sp_step = point_sharded_train_step(mesh, model, smoothing=0.2,
                                       per_point=True)
    sp_state, sp_metrics = sp_step(
        state, pos, nrm, label,
        jax.random.fold_in(jax.random.PRNGKey(7), 0), category=cat)

    np.testing.assert_allclose(float(sp_metrics["loss"]),
                               float(ref_metrics["loss"]), atol=1e-5)
    np.testing.assert_allclose(float(sp_metrics["accuracy"]),
                               float(ref_metrics["accuracy"]), atol=1e-6)

    for tree_name in ("params", "batch_stats"):
        flat_ref = jax.tree_util.tree_leaves_with_path(
            getattr(ref_state, tree_name))
        flat_sp = dict(jax.tree_util.tree_leaves_with_path(
            getattr(sp_state, tree_name)))
        for path, want in flat_ref:
            got = flat_sp[path]
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=2e-4,
                err_msg=f"{tree_name}{path}")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_nbr_protocol_matmul_minmax_matches(rng):
    """ShardedGradDiv's fused gather-then-matmul (max, min) must match
    the single-device protocol (it indexes the already-full product
    table directly — no second all-gather)."""
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from deltaconv_tpu.parallel.point_sharding import (
        ShardedGradDiv,
        point_sharded_operators,
    )

    n, k, c_in, c_out = 256, 8, 4, 6
    pos = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    nrm = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    x = jnp.asarray(rng.random((n, c_in)).astype(np.float32))
    w = jnp.asarray(rng.random((c_in, c_out)).astype(np.float32))

    nbr, mask = knn(pos, k)
    # Plain-numpy reference (gd.nbr_matmul_minmax is the TPU-only
    # Pallas fast path and does not lower on the CPU mesh).
    y = np.asarray(x) @ np.asarray(w)
    g = y[np.asarray(nbr)]
    m = np.asarray(mask)[..., None]
    want_mx = np.max(np.where(m, g, -np.float32(3e38)), axis=-2)
    want_mn = np.min(np.where(m, g, np.float32(3e38)), axis=-2)

    mesh = Mesh(np.asarray(jax.devices()), ("points",))
    sgd = point_sharded_operators(mesh, pos, k, normal=nrm)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: P("points"), sgd),
            P("points"), P(None)),
        out_specs=(P("points"), P("points")),
        check_vma=False,
    )
    def run(sgd_local, x_l, w_full):
        s = ShardedGradDiv(sgd_local, "points")
        return s.nbr_matmul_minmax(x_l, w_full)

    got_mx, got_mn = run(sgd, x, w)
    np.testing.assert_allclose(np.asarray(got_mx), np.asarray(want_mx),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_mn), np.asarray(want_mn),
                               atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_point_sharded_tiled_knn_matches_dense(rng, monkeypatch):
    """The tiled column-sweep kNN (engaged above _KNN_TILE; VERDICT
    round-2 item 4 — memory O(n_local * tile) instead of the full
    [n_local, N_total] block) must select the exact same neighbors and
    reproduce the dense-path point-sharded forward."""
    import deltaconv_tpu.parallel.point_sharding as ps

    n, k = 512, 12
    pos = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    nrm = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    x = jnp.asarray(rng.random((n, 4)).astype(np.float32))

    # Direct _local_knn equality: dense vs tiled on the same queries.
    dense_idx = np.asarray(ps._local_knn(pos[:64], pos, k, 0))
    monkeypatch.setattr(ps, "_KNN_TILE", 96)  # force >1 non-even tiles
    tiled_idx = np.asarray(ps._local_knn(pos[:64], pos, k, 0))
    np.testing.assert_array_equal(tiled_idx, dense_idx)

    # Full point-sharded forward through the tiled path.
    nbr, mask = knn(pos, k)
    xb, yb = build_tangent_basis(nrm)
    gd = build_grad_div(pos, nrm, xb, yb, nbr, mask)
    want = np.asarray(laplacian(x, gd))
    mesh = Mesh(np.asarray(jax.devices()), ("points",))
    got = np.asarray(
        point_sharded_laplacian(mesh, pos, x, k, normal=nrm)
    )
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_point_sharded_bucketed_knn_matches_dense(rng, monkeypatch):
    """The Morton-bucketed candidate kNN (round 5; engaged above
    _KNN_BUCKETED_MIN on TPU) inside the FULL point-sharded pipeline:
    via the interpret hook, the exact bucketed branch must select the
    same winner SETS as the dense path and reproduce the point-sharded
    laplacian through the sharded build on the 8-device mesh."""
    import deltaconv_tpu.parallel.point_sharding as ps

    n, k = 512, 12
    pos = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    nrm = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    x = jnp.asarray(rng.random((n, 4)).astype(np.float32))

    dense_idx = np.asarray(ps._local_knn(pos[:64], pos, k, 0))
    monkeypatch.setattr(ps, "_KNN_TILE", 96)  # skip the short-table path
    monkeypatch.setattr(ps, "_FORCE_BUCKETED_INTERPRET", True)
    b_idx = np.asarray(ps._local_knn(pos[:64], pos, k, 0))
    assert b_idx.shape == dense_idx.shape
    for i in range(64):
        assert b_idx[i, 0] == dense_idx[i, 0]
        assert set(b_idx[i].tolist()) == set(dense_idx[i].tolist()), i

    # Full sharded build + apply through the bucketed branch.
    nbr, mask = knn(pos, k)
    xb, yb = build_tangent_basis(nrm)
    gd = build_grad_div(pos, nrm, xb, yb, nbr, mask)
    want = np.asarray(laplacian(x, gd))
    mesh = Mesh(np.asarray(jax.devices()), ("points",))
    got = np.asarray(
        point_sharded_laplacian(mesh, pos, x, k, normal=nrm)
    )
    np.testing.assert_allclose(got, want, atol=5e-4)


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_point_sharded_knn_large_cloud(rng):
    """Genuinely large-N sharded kNN (VERDICT round-2 item 4: N~=64k on
    the 8-device CPU mesh): the tiled column sweep — the memory-bounded
    path point sharding exists for, O(n_local * tile) per shard instead
    of the [n_local, N] distance block — selects the exact nearest
    neighbors. Verified against a numpy blocked argpartition reference
    on a spot-checked row subset (a full [64k, 64k] float64 check would
    need 34 GB)."""
    import deltaconv_tpu.parallel.point_sharding as ps
    from jax.sharding import NamedSharding, PartitionSpec as P

    n, k, d = 65536, 8, 8
    pos_np = rng.random((n, 3)).astype(np.float32)
    pos = jnp.asarray(pos_np)
    mesh = Mesh(np.asarray(jax.devices()), ("points",))
    pos_sh = jax.device_put(pos, NamedSharding(mesh, P("points")))

    def body(pos_l):
        ax = jax.lax.axis_index("points")
        full = jax.lax.all_gather(pos_l, "points", axis=0, tiled=True)
        return ps._local_knn(pos_l, full, k, ax * (n // d))

    idx = np.asarray(jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=P("points"), out_specs=P("points"),
        check_vma=False))(pos_sh))

    assert np.all(idx[:, 0] == np.arange(n))
    # Spot-check rows against a blocked numpy exact reference.
    check = rng.integers(0, n, 256)
    q = pos_np[check].astype(np.float64)  # [R, 3]
    best = np.full((len(check), 0), 0.0)
    d2_rows = []
    for c0 in range(0, n, 8192):
        blk = pos_np[c0:c0 + 8192].astype(np.float64)
        d2_rows.append(((q[:, None, :] - blk[None, :, :]) ** 2).sum(-1))
    d2 = np.concatenate(d2_rows, axis=1)
    d2[np.arange(len(check)), check] = -1.0  # self first
    ref_sets = np.argpartition(d2, k, axis=1)[:, :k]
    for r in range(len(check)):
        assert set(idx[check[r]]) == set(ref_sets[r]), check[r]
