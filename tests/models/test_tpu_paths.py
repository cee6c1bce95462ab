"""TPU-only end-to-end path coverage (DELTACONV_TEST_TPU=1).

The CPU suite exercises the reference/XLA paths; the Pallas kernel
paths only compile on real TPU. These tests are the regression net for
kernel-path breakage that unit kernel tests miss because only the full
model composes them (e.g. a train-only gather_sum select-accumulate
once crashed the Mosaic compile helper while every eval bench passed).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ON_TPU = (os.environ.get("DELTACONV_TEST_TPU") == "1"
          and jax.default_backend() == "tpu")

pytestmark = pytest.mark.skipif(not ON_TPU,
                                reason="TPU end-to-end paths need a TPU")


def _bench_model(**over):
    from deltaconv_tpu.models import DeltaNetClassification

    kw = dict(num_classes=10, conv_channels=(32, 32, 64),
              num_neighbors=12, dense_operators=True,
              operator_dtype="bfloat16", compute_dtype="bfloat16",
              knn_method="approx")
    kw.update(over)
    return DeltaNetClassification(**kw)


def _batch(b=4, n=256, classes=10):
    from deltaconv_tpu.data import synthetic_classification_batch

    batch = synthetic_classification_batch(0, b, n, classes)
    return {k: jnp.asarray(v) for k, v in batch.items()}


def test_bench_config_eval_matches_f32_exact():
    """The serving config (bf16 operators/compute, approx kNN, fused
    Pallas build + eval gather kernels) must track the f32/exact XLA
    path on the same parameters."""
    batch = _batch()
    pos, normal = batch["pos"], batch["normal"]
    fast = _bench_model()
    slow = _bench_model(dense_operators=True, operator_dtype=None,
                        compute_dtype=None, knn_method="exact")
    variables = jax.jit(
        lambda p, n: slow.init(jax.random.PRNGKey(0), p, normal=n,
                               train=False))(pos, normal)
    out_fast = jax.jit(lambda p, n: fast.apply(
        variables, p, normal=n, train=False))(pos, normal)
    out_slow = jax.jit(lambda p, n: slow.apply(
        variables, p, normal=n, train=False))(pos, normal)
    a, b = np.asarray(out_fast), np.asarray(out_slow)
    assert np.isfinite(a).all()
    agree = (a.argmax(-1) == b.argmax(-1)).mean()
    assert agree >= 0.75, f"top-1 agreement {agree}"
    np.testing.assert_allclose(a, b, atol=0.5, rtol=0.5)


def test_bench_config_train_step_runs():
    """One optimizer step through the FULL mixed-precision train path
    (edge-stats gather_sum, winner VJP kernels, WLS backward) must
    compile and produce finite losses."""
    from deltaconv_tpu.training import (create_train_state,
                                        make_train_step, sgd_momentum)

    batch = _batch()
    model = _bench_model()
    state = create_train_state(
        model, jax.random.PRNGKey(0), (batch["pos"],),
        sgd_momentum(0.05),
        init_kwargs={"normal": batch["normal"]})
    step = jax.jit(make_train_step(model))
    losses = []
    for i in range(3):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses)), losses


def test_int8_operator_mode_logit_parity(rng):
    """The opt-in int8 quantized-operator serving mode
    (operator_dtype="int8", geometry/dense.py) tracks the exact f32
    path closely: logit deviation well under 1% of the logit scale and
    identical argmax on the synthetic eval batch. Runs on CPU via the
    XLA quantize fallback; the TPU kernel is bit-exact against it
    (tests/ops)."""
    import jax
    import jax.numpy as jnp

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


def test_seg_config_deep_fused_path_matches_reference():
    """mlp_depth=2 eval (the DeepMaxMLP fused gather+MLP+max kernel,
    engaged for the centralized first conv AND the C_in<C_out last
    conv) vs the reference path (_FORCE_FUSED_OFF) on the same
    variables — the segmentation config's scalar stream."""
    import jax
    import jax.numpy as jnp

    import deltaconv_tpu.nn.deltaconv as dc
    from deltaconv_tpu.data import synthetic_classification_batch
    from deltaconv_tpu.models import DeltaNetSegmentation

    batch = synthetic_classification_batch(0, 2, 256, 8)
    pos, nrm = jnp.asarray(batch["pos"]), jnp.asarray(batch["normal"])
    cat = jnp.eye(16)[jnp.asarray(batch["label"]) % 16]
    model = DeltaNetSegmentation(
        num_classes=8, conv_channels=(64, 128, 256), mlp_depth=2,
        categorical_vector=True, num_neighbors=12,
        dense_operators=True, operator_dtype="bfloat16",
        compute_dtype="bfloat16")
    variables = jax.jit(
        lambda p, n, c: model.init(jax.random.PRNGKey(0), p, normal=n,
                                   category=c, train=False)
    )(pos, nrm, cat)

    fused = np.asarray(jax.jit(
        lambda p, n, c: model.apply(variables, p, normal=n, category=c,
                                    train=False))(pos, nrm, cat),
        np.float32)
    dc._FORCE_FUSED_OFF = True
    try:
        ref = np.asarray(jax.jit(
            lambda p, n, c: model.apply(variables, p, normal=n,
                                        category=c, train=False))(
            pos, nrm, cat), np.float32)
    finally:
        dc._FORCE_FUSED_OFF = False

    scale = np.abs(ref).max()
    # Exact up to bf16 reassociation inside the per-edge MLP chain.
    assert np.abs(fused - ref).max() < 0.02 * scale
    agree = (np.argmax(fused, -1) == np.argmax(ref, -1)).mean()
    assert agree > 0.99
