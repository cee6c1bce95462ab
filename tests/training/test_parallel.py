"""Data-parallel correctness: a train step over the 8-device mesh must
match the single-device step bit-for-bit (up to reduction-order f32
noise)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deltaconv_tpu.data.synthetic import (
    synthetic_classification_batch,
    synthetic_segmentation_batch,
)
from deltaconv_tpu.models import DeltaNetClassification, DeltaNetSegmentation
from deltaconv_tpu.parallel import make_mesh, shard_train_step
from deltaconv_tpu.training import (
    create_train_state,
    make_train_step,
    sgd_momentum,
)

B, N, K, CLASSES = 8, 96, 10, 4


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_step_matches_single_device():
    model = DeltaNetClassification(
        num_classes=CLASSES, conv_channels=(8, 8), num_neighbors=K
    )
    batch = synthetic_classification_batch(7, B, N, CLASSES)
    state = create_train_state(
        model,
        jax.random.PRNGKey(0),
        (batch["pos"],),
        sgd_momentum(0.01),
        init_kwargs={"normal": jnp.asarray(batch["normal"])},
    )
    train_step = make_train_step(model, smoothing=0.2)
    rng = jax.random.PRNGKey(5)

    # Single device.
    state_1, metrics_1 = train_step(state, batch, rng)

    # 8-device data parallel.
    mesh = make_mesh()
    sharded = shard_train_step(train_step, mesh)
    state_8, metrics_8 = sharded(state, batch, rng)

    np.testing.assert_allclose(
        float(metrics_1["loss"]), float(metrics_8["loss"]), rtol=1e-5
    )
    l1 = jax.tree_util.tree_leaves(state_1.params)
    l8 = jax.tree_util.tree_leaves(state_8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_seg_step_matches_single_device():
    """The data-parallel SEGMENTATION train step (per-point labels +
    categorical one-hot, the ShapeNet workload of
    /root/reference/experiments/train_shapenet.py) over the 8-device
    mesh must match the single-device step: masked per-point loss,
    psum'd BatchNorm statistics, psum'd gradients."""
    model = DeltaNetSegmentation(
        num_classes=6, conv_channels=(8, 8), mlp_depth=1,
        embedding_size=16, categorical_vector=True, num_neighbors=K,
    )
    batch = synthetic_segmentation_batch(11, B, N, num_parts=6,
                                         num_categories=16)
    state = create_train_state(
        model,
        jax.random.PRNGKey(0),
        (batch["pos"],),
        sgd_momentum(0.01),
        init_kwargs={"normal": jnp.asarray(batch["normal"]),
                     "category": jnp.asarray(batch["category"])},
    )
    train_step = make_train_step(model, smoothing=0.2, per_point=True)
    rng = jax.random.PRNGKey(5)

    state_1, metrics_1 = train_step(state, batch, rng)

    mesh = make_mesh()
    sharded = shard_train_step(train_step, mesh)
    state_8, metrics_8 = sharded(state, batch, rng)

    np.testing.assert_allclose(
        float(metrics_1["loss"]), float(metrics_8["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics_1["accuracy"]), float(metrics_8["accuracy"]),
        atol=1e-6
    )
    for tree_name in ("params", "batch_stats"):
        l1 = jax.tree_util.tree_leaves(getattr(state_1, tree_name))
        l8 = jax.tree_util.tree_leaves(getattr(state_8, tree_name))
        for a, b in zip(l1, l8):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
            )
