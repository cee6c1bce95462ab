"""Model-level tests: forward shapes under jit, mask handling, and the
end-to-end training slice (loss decreases on learnable synthetic data).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deltaconv_tpu.data.synthetic import synthetic_classification_batch
from deltaconv_tpu.models import (
    DeltaNetClassification,
    DeltaNetSegmentation,
)
from deltaconv_tpu.training import (
    cosine_epoch_schedule,
    create_train_state,
    make_eval_step,
    make_train_step,
    sgd_momentum,
)

B, N, K, CLASSES = 4, 128, 12, 4


def _model(**kw):
    return DeltaNetClassification(
        num_classes=CLASSES,
        conv_channels=(16, 16),
        num_neighbors=K,
        **kw,
    )


def test_classification_forward_shapes():
    batch = synthetic_classification_batch(0, B, N, CLASSES)
    model = _model()
    variables = jax.jit(
        lambda p, nrm: model.init(jax.random.PRNGKey(0), p, normal=nrm,
                                  train=False)
    )(batch["pos"], batch["normal"])
    logits = jax.jit(
        lambda v, p, nrm: model.apply(v, p, normal=nrm, train=False)
    )(variables, batch["pos"], batch["normal"])
    assert logits.shape == (B, CLASSES)
    assert not np.any(np.isnan(np.asarray(logits)))


def test_classification_without_normals():
    batch = synthetic_classification_batch(1, B, N, CLASSES,
                                           with_normals=False)
    model = _model()
    variables = jax.jit(
        lambda p: model.init(jax.random.PRNGKey(0), p, train=False)
    )(batch["pos"])
    logits = jax.jit(lambda v, p: model.apply(v, p, train=False))(
        variables, batch["pos"]
    )
    assert logits.shape == (B, CLASSES)
    assert not np.any(np.isnan(np.asarray(logits)))


def test_segmentation_forward_shapes():
    batch = synthetic_classification_batch(2, B, N, CLASSES)
    category = np.eye(16, dtype=np.float32)[np.zeros(B, np.int32)]
    model = DeltaNetSegmentation(
        num_classes=8,
        conv_channels=(16, 16),
        mlp_depth=1,
        embedding_size=32,
        categorical_vector=True,
        num_neighbors=K,
    )
    variables = jax.jit(
        lambda p, nrm, c: model.init(jax.random.PRNGKey(0), p, normal=nrm,
                                     category=c, train=False)
    )(batch["pos"], batch["normal"], category)
    logits = jax.jit(
        lambda v, p, nrm, c: model.apply(v, p, normal=nrm, category=c,
                                         train=False)
    )(variables, batch["pos"], batch["normal"], category)
    assert logits.shape == (B, N, 8)
    assert not np.any(np.isnan(np.asarray(logits)))


def test_point_mask_invariance():
    """Padding a batch with masked junk points must not change logits."""
    batch = synthetic_classification_batch(3, B, N, CLASSES)
    model = _model()
    variables = jax.jit(
        lambda p, nrm: model.init(jax.random.PRNGKey(0), p, normal=nrm,
                                  train=False)
    )(batch["pos"], batch["normal"])

    apply_masked = jax.jit(
        lambda v, p, nrm, m: model.apply(v, p, normal=nrm, point_mask=m,
                                         train=False)
    )

    mask_full = np.ones((B, N), bool)
    logits_full = apply_masked(variables, batch["pos"], batch["normal"],
                               mask_full)

    pad = 32
    pos_pad = np.concatenate(
        [batch["pos"], np.full((B, pad, 3), 7.3, np.float32)], axis=1
    )
    nrm_pad = np.concatenate(
        [batch["normal"], np.ones((B, pad, 3), np.float32)], axis=1
    )
    mask_pad = np.concatenate([mask_full, np.zeros((B, pad), bool)], axis=1)
    logits_pad = apply_masked(variables, pos_pad, nrm_pad, mask_pad)

    np.testing.assert_allclose(
        np.asarray(logits_full), np.asarray(logits_pad), atol=2e-4
    )


def test_point_mask_invariance_train_mode():
    """Masked padding must not change the *training* loss either —
    BatchNorm statistics exclude masked points (regression for the
    masked-BN bug found in verification)."""
    model = _model()
    batch = synthetic_classification_batch(9, B, N, CLASSES)
    state = create_train_state(
        model,
        jax.random.PRNGKey(0),
        (batch["pos"],),
        sgd_momentum(0.01),
        init_kwargs={"normal": jnp.asarray(batch["normal"])},
    )
    train_step = make_train_step(model, smoothing=0.2)
    rng = jax.random.PRNGKey(2)

    _, m_plain = train_step(state, batch, rng)

    pad = 32
    batch_pad = {
        "pos": np.concatenate(
            [batch["pos"], np.full((B, pad, 3), 9.9, np.float32)], axis=1
        ),
        "normal": np.concatenate(
            [batch["normal"], np.ones((B, pad, 3), np.float32)], axis=1
        ),
        "point_mask": np.concatenate(
            [np.ones((B, N), bool), np.zeros((B, pad), bool)], axis=1
        ),
        "label": batch["label"],
    }
    _, m_pad = train_step(state, batch_pad, rng)
    np.testing.assert_allclose(
        float(m_plain["loss"]), float(m_pad["loss"]), atol=1e-4
    )


def test_end_to_end_training_slice():
    """The ONE-model-training milestone: a few SGD steps on learnable
    synthetic shapes must strictly reduce the loss."""
    model = _model()
    batch = synthetic_classification_batch(4, 8, N, CLASSES)
    schedule = cosine_epoch_schedule(0.05, epochs=10, steps_per_epoch=1)
    state = create_train_state(
        model,
        jax.random.PRNGKey(0),
        (batch["pos"],),
        sgd_momentum(schedule),
        init_kwargs={"normal": jnp.asarray(batch["normal"])},
    )
    train_step = make_train_step(model, smoothing=0.2)

    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(8):
        state, metrics = train_step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses

    eval_step = make_eval_step(model)
    logits = eval_step(state, batch)
    assert logits.shape == (8, CLASSES)


def test_seg_int8_operator_mode_logit_parity_cpu(rng):
    """Segmentation analog of the int8 serving-mode parity check
    (bench.py --mode=seg-int8): quantized operators track the exact
    path within 1% of the logit scale with near-identical per-point
    argmax on the synthetic batch."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deltaconv_tpu.data import synthetic_classification_batch
    from deltaconv_tpu.models import DeltaNetSegmentation

    batch = synthetic_classification_batch(0, 2, 256, 8)
    pos, nrm = jnp.asarray(batch["pos"]), jnp.asarray(batch["normal"])
    cat = jnp.eye(16)[jnp.asarray(batch["label"]) % 16]
    kw = dict(num_classes=8, conv_channels=(16, 16, 32), mlp_depth=2,
              categorical_vector=True, num_neighbors=12,
              dense_operators=True)
    m32 = DeltaNetSegmentation(**kw)
    m8 = DeltaNetSegmentation(**kw, operator_dtype="int8")
    variables = m32.init(jax.random.PRNGKey(0), pos, normal=nrm,
                         category=cat, train=False)
    l32 = np.asarray(m32.apply(variables, pos, normal=nrm, category=cat,
                               train=False))
    l8 = np.asarray(m8.apply(variables, pos, normal=nrm, category=cat,
                             train=False))
    scale = np.abs(l32).max()
    assert np.abs(l8 - l32).max() < 0.01 * scale
    agree = (np.argmax(l8, -1) == np.argmax(l32, -1)).mean()
    assert agree >= 0.995, agree


def test_seg_int8_fused_deepmax_interpret_cpu(rng, monkeypatch):
    """ADVICE r4: the fused DeepMaxMLP eval kernel stays ENGAGED under
    int8 OPERATORS (the int8 trade lives in the operator applies, not
    the gather — nn/deltaconv.py DeepMaxMLP), but that combination
    only runs with backend=="tpu". Exercise it on CPU via the
    interpret hook: fused int8+bf16 logits must track the unfused
    int8+bf16 reference path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import deltaconv_tpu.nn.deltaconv as dc
    from deltaconv_tpu.data import synthetic_classification_batch
    from deltaconv_tpu.models import DeltaNetSegmentation

    batch = synthetic_classification_batch(0, 2, 256, 8)
    pos, nrm = jnp.asarray(batch["pos"]), jnp.asarray(batch["normal"])
    cat = jnp.eye(16)[jnp.asarray(batch["label"]) % 16]
    m8 = DeltaNetSegmentation(
        num_classes=8, conv_channels=(16, 16, 32), mlp_depth=2,
        categorical_vector=True, num_neighbors=12,
        dense_operators=True, operator_dtype="int8",
        compute_dtype="bfloat16")
    variables = m8.init(jax.random.PRNGKey(0), pos, normal=nrm,
                        category=cat, train=False)

    def run(fused):
        monkeypatch.setattr(dc, "_FORCE_FUSED_INTERPRET", fused)
        monkeypatch.setattr(dc, "_FORCE_FUSED_OFF", not fused)
        try:
            return np.asarray(m8.apply(
                variables, pos, normal=nrm, category=cat,
                train=False), np.float32)
        finally:
            monkeypatch.undo()

    want = run(False)
    got = run(True)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 0.05 * scale
    agree = (np.argmax(got, -1) == np.argmax(want, -1)).mean()
    assert agree >= 0.99, agree


def test_int8_operator_mode_logit_parity_cpu(rng):
    """CPU (XLA-fallback) variant of the int8 serving-mode parity
    check in test_tpu_paths.py: quantized operators + quantized
    gathers track the exact f32 path within 1% of the logit scale
    with identical argmax."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deltaconv_tpu.data import synthetic_classification_batch
    from deltaconv_tpu.models import DeltaNetClassification

    batch = synthetic_classification_batch(0, 4, 256, 10)
    pos, nrm = jnp.asarray(batch["pos"]), jnp.asarray(batch["normal"])
    kw = dict(num_classes=10, conv_channels=(16, 16, 32),
              num_neighbors=12, dense_operators=True)
    m32 = DeltaNetClassification(**kw)
    m8 = DeltaNetClassification(**kw, operator_dtype="int8")
    variables = m32.init(jax.random.PRNGKey(0), pos, normal=nrm,
                         train=False)
    l32 = np.asarray(m32.apply(variables, pos, normal=nrm, train=False))
    l8 = np.asarray(m8.apply(variables, pos, normal=nrm, train=False))
    scale = np.abs(l32).max()
    assert np.abs(l8 - l32).max() < 0.01 * scale
    assert (np.argmax(l8, -1) == np.argmax(l32, -1)).all()
