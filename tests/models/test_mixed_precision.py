"""Mixed-precision (compute_dtype=bfloat16) path: same parameter tree,
approximately equal outputs, and stable end-to-end training."""

import jax
import jax.numpy as jnp
import numpy as np

from deltaconv_tpu.data import synthetic_classification_batch
from deltaconv_tpu.models import DeltaNetClassification


def _models(num_classes=4):
    kw = dict(num_classes=num_classes, conv_channels=(16, 16),
              num_neighbors=10)
    return (DeltaNetClassification(**kw),
            DeltaNetClassification(compute_dtype="bfloat16", **kw))


def test_bf16_matches_f32_forward(rng):
    f32, bf16 = _models()
    batch = synthetic_classification_batch(0, 4, 96, 4)
    pos = jnp.asarray(batch["pos"])
    normal = jnp.asarray(batch["normal"])

    variables = jax.jit(
        lambda p, n: f32.init(jax.random.PRNGKey(0), p, normal=n,
                              train=False)
    )(pos, normal)
    # Identical parameter tree: the bf16 model applies f32 params.
    out32 = jax.jit(lambda p, n: f32.apply(variables, p, normal=n,
                                           train=False))(pos, normal)
    out16 = jax.jit(lambda p, n: bf16.apply(variables, p, normal=n,
                                            train=False))(pos, normal)
    assert out16.dtype == jnp.float32  # logits head is f32
    # bf16 matmuls: agreement to ~1e-2 absolute on logits.
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               atol=2e-1, rtol=2e-1)
    # Class ranking mostly preserved.
    agree = (np.argmax(np.asarray(out16), -1)
             == np.argmax(np.asarray(out32), -1)).mean()
    assert agree >= 0.75


def test_bf16_trains(rng):
    from deltaconv_tpu.training import (create_train_state,
                                        make_train_step, sgd_momentum)

    _, bf16 = _models()
    batch = synthetic_classification_batch(0, 8, 96, 4)
    state = create_train_state(
        bf16, jax.random.PRNGKey(0), (jnp.asarray(batch["pos"]),),
        sgd_momentum(0.05),
        init_kwargs={"normal": jnp.asarray(batch["normal"])})
    step = jax.jit(make_train_step(bf16))
    b = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = []
    for i in range(8):
        state, m = step(state, b, jax.random.PRNGKey(1))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
