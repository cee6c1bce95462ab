"""InferenceEngine serving-surface tests: padding/masking parity with
the direct model apply, ragged batching, checkpoint restore, precision
modes (reference eval semantics: train_modelnet.py:104-121)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deltaconv_tpu.data import synthetic_classification_batch
from deltaconv_tpu.models import (
    DeltaNetClassification,
    DeltaNetSegmentation,
)
from deltaconv_tpu.serving import InferenceEngine

CLS_KW = dict(num_classes=5, conv_channels=(16, 16), num_neighbors=8,
              embedding_size=32)


def _clouds(rng, sizes):
    return [rng.standard_normal((n, 3)).astype(np.float32)
            for n in sizes]


def _normals(rng, sizes):
    vs = [rng.standard_normal((n, 3)).astype(np.float32)
          for n in sizes]
    return [v / np.linalg.norm(v, axis=1, keepdims=True) for v in vs]


@pytest.fixture(scope="module")
def cls_setup():
    model = DeltaNetClassification(**CLS_KW)
    pos = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 64, 3)),
        jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), pos, train=False)
    return model, variables


def test_classification_ragged_matches_direct_apply(rng, cls_setup):
    """Ragged clouds through the engine == a hand-padded masked apply
    (same num_points), including across an uneven final batch."""
    model, variables = cls_setup
    sizes = [64, 50, 33, 64, 41]
    clouds = _clouds(rng, sizes)
    normals = _normals(rng, sizes)
    engine = InferenceEngine(model, variables, num_points=64,
                             batch_size=2)
    got = engine.predict(clouds, normals=normals)
    assert got.shape == (5, 5)

    for i, (c, nr) in enumerate(zip(clouds, normals)):
        n = c.shape[0]
        pos = np.zeros((1, 64, 3), np.float32)
        pos[0, :n] = c
        nrm = np.tile([0.0, 0.0, 1.0], (1, 64, 1)).astype(np.float32)
        nrm[0, :n] = nr
        mask = (np.arange(64) < n)[None]
        want = model.apply(variables, jnp.asarray(pos),
                           normal=jnp.asarray(nrm),
                           point_mask=jnp.asarray(mask), train=False)
        np.testing.assert_allclose(got[i], np.asarray(want)[0],
                                   rtol=1e-4, atol=1e-4)


def test_uniform_clouds_take_unmasked_path(rng, cls_setup):
    """All-full clouds run without a mask and match the masked
    graph's answers (mask of all ones is a no-op)."""
    model, variables = cls_setup
    clouds = _clouds(rng, [64, 64, 64])
    normals = _normals(rng, [64, 64, 64])
    engine = InferenceEngine(model, variables, num_points=64,
                             batch_size=4)
    got = engine.predict(clouds, normals=normals)
    assert list(engine._jitted) == [(False, True, False)]
    want = model.apply(
        variables, jnp.asarray(np.stack(clouds)),
        normal=jnp.asarray(np.stack(normals)), train=False)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4,
                               atol=1e-4)


def test_oversized_cloud_rejected(rng, cls_setup):
    model, variables = cls_setup
    engine = InferenceEngine(model, variables, num_points=64)
    with pytest.raises(ValueError, match="subsample"):
        engine.predict(_clouds(rng, [65]))


def test_segmentation_trims_and_routes_categories(rng):
    """Segmentation output comes back per cloud, trimmed to its true
    size, with the one-hot category plumbed through."""
    model = DeltaNetSegmentation(
        num_classes=6, conv_channels=(16, 16), num_neighbors=8,
        embedding_size=32, categorical_vector=True)
    pos0 = jnp.asarray(rng.standard_normal((1, 48, 3)), jnp.float32)
    cat0 = jnp.eye(16)[jnp.zeros((1,), jnp.int32)]
    variables = model.init(jax.random.PRNGKey(0), pos0, category=cat0,
                           train=False)
    engine = InferenceEngine(model, variables, num_points=48,
                             batch_size=2)
    sizes = [48, 37, 20]
    clouds = _clouds(rng, sizes)
    outs = engine.predict(clouds, categories=[3, 1, 7])
    assert [o.shape for o in outs] == [(48, 6), (37, 6), (20, 6)]

    pos = np.zeros((1, 48, 3), np.float32)
    pos[0, :37] = clouds[1]
    mask = (np.arange(48) < 37)[None]
    want = model.apply(variables, jnp.asarray(pos),
                       category=jnp.eye(16)[jnp.asarray([1])],
                       point_mask=jnp.asarray(mask), train=False)
    np.testing.assert_allclose(outs[1], np.asarray(want)[0, :37],
                               rtol=1e-4, atol=1e-4)


def test_from_checkpoint_roundtrip(tmp_path, rng, cls_setup):
    """Orbax save -> InferenceEngine.from_checkpoint gives the same
    logits as the in-memory variables."""
    from deltaconv_tpu.training import (
        create_train_state,
        save_checkpoint,
        sgd_momentum,
    )

    model, variables = cls_setup
    pos = jnp.asarray(rng.standard_normal((2, 64, 3)), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), (pos,),
                               sgd_momentum(0.01))
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])
    save_checkpoint(str(tmp_path / "ck"), state, step=7)

    engine = InferenceEngine.from_checkpoint(
        model, str(tmp_path / "ck"), num_points=64, batch_size=2)
    clouds = _clouds(rng, [64, 40])
    base = InferenceEngine(model, variables, num_points=64,
                           batch_size=2)
    np.testing.assert_allclose(engine.predict(clouds),
                               base.predict(clouds), rtol=1e-5,
                               atol=1e-5)


def test_precision_modes(rng):
    """bf16 and int8 precision clones stay argmax-consistent with the
    f32 engine on a separable synthetic batch; float32 on a bf16-built
    model strips the low-precision config."""
    batch = synthetic_classification_batch(0, 4, 128, 5)
    clouds = list(np.asarray(batch["pos"]))
    normals = list(np.asarray(batch["normal"]))
    model = DeltaNetClassification(**CLS_KW, dense_operators=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(batch["pos"]), train=False)

    engines = {
        p: InferenceEngine(model, variables, num_points=128,
                           batch_size=4, precision=p)
        for p in (None, "bfloat16", "int8")
    }
    outs = {p: e.predict(clouds, normals=normals)
            for p, e in engines.items()}
    base = outs[None]
    scale = np.abs(base).max()
    top2 = np.sort(base, axis=-1)
    margin = top2[:, -1] - top2[:, -2]  # f32 top-2 logit gap
    for p in ("bfloat16", "int8"):
        dev = np.abs(outs[p] - base).max()
        assert dev < 0.05 * scale, (p, dev, scale)
        # argmax must survive wherever the f32 decision margin exceeds
        # the worst-case deviation (untrained weights leave some clouds
        # near-tied; a flip there is rounding, not a wrong answer).
        decisive = margin > 2 * dev
        assert decisive.any()
        assert (outs[p].argmax(-1) == base.argmax(-1))[decisive].all(), p

    bf16_model = model.clone(compute_dtype="bfloat16",
                             operator_dtype="bfloat16")
    stripped = InferenceEngine(bf16_model, variables, num_points=128,
                               precision="float32")
    assert stripped.model.compute_dtype is None
    assert stripped.model.operator_dtype is None

    with pytest.raises(ValueError, match="precision"):
        InferenceEngine(model, variables, num_points=128,
                        precision="fp4")

    # int8 quantization only exists on the dense-operator path; a
    # silent no-op would misreport the active serving mode.
    coef_model = model.clone(dense_operators=False)
    with pytest.raises(ValueError, match="dense_operators"):
        InferenceEngine(coef_model, variables, num_points=128,
                        precision="int8")


def test_predict_voting(rng, cls_setup):
    """Voting sums num_votes augmented passes: with an identity
    augment it equals num_votes * predict exactly; with the default
    stochastic augment it differs from the single pass but keeps
    shape/finiteness."""
    model, variables = cls_setup
    engine = InferenceEngine(model, variables, num_points=64,
                             batch_size=2)
    clouds = _clouds(rng, [64, 50, 64])
    normals = _normals(rng, [64, 50, 64])

    identity = lambda key, pos, normal: (pos, normal)
    voted = engine.predict_voting(clouds, normals=normals, num_votes=3,
                                  augment=identity)
    single = engine.predict(clouds, normals=normals)
    np.testing.assert_allclose(voted, 3.0 * single, rtol=1e-5,
                               atol=1e-5)

    stochastic = engine.predict_voting(clouds, normals=normals,
                                       num_votes=2, seed=3)
    assert stochastic.shape == single.shape
    assert np.isfinite(stochastic).all()
    assert np.abs(stochastic - 2.0 * single).max() > 1e-4
    assert engine.predict_voting([], num_votes=2) == []


def test_predict_sharded_matches_single_device(rng, cls_setup):
    """One oversized cloud served point-sharded over the 8-device mesh
    equals the padded single-device forward; int8 is rejected on the
    sharded path."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    model, variables = cls_setup
    model = model.clone(dense_operators=False)
    engine = InferenceEngine(model, variables, num_points=64,
                             batch_size=2)
    n = 150  # not a multiple of the mesh -> exercises pad_cloud
    cloud = rng.standard_normal((n, 3)).astype(np.float32)
    nrm = rng.standard_normal((n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)

    got = engine.predict_sharded(cloud, normal=nrm)
    assert got.shape == (5,)

    import jax.numpy as jnp

    from deltaconv_tpu.parallel import pad_cloud
    pos_p, nrm_p, pm = pad_cloud(jnp.asarray(cloud), 8,
                                 jnp.asarray(nrm))
    want = np.asarray(model.apply(
        variables, pos_p[None], normal=nrm_p[None],
        point_mask=pm[None], train=False))[0]
    np.testing.assert_allclose(got, want, atol=2e-4)

    batch = synthetic_classification_batch(0, 2, 128, 5)
    dense8 = InferenceEngine(
        DeltaNetClassification(**CLS_KW, dense_operators=True),
        variables, num_points=64, precision="int8")
    with pytest.raises(ValueError, match="int8"):
        dense8.predict_sharded(cloud)


def test_category_encoding_guards(rng):
    """Out-of-range int category ids are rejected (jit would silently
    clamp the one-hot gather); pre-encoded vectors pass through."""
    from deltaconv_tpu.serving import InferenceEngine as IE

    onehot = IE._encode_category(3)
    assert onehot.shape == (16,) and onehot[3] == 1.0
    passthrough = IE._encode_category(np.zeros(24, np.float32))
    assert passthrough.shape == (24,)
    with pytest.raises(ValueError, match="category id"):
        IE._encode_category(16)
