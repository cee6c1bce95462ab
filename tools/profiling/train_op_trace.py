"""Round-4 train lever hunt: FULL op-name device breakdown of the
train step (the eval_op_trace analog for fwd+bwd+update) — locates
the ~7.9 ms of XLA fusions outside the Pallas gather kernels."""
import sys

import jax
import jax.numpy as jnp

import bench
from deltaconv_tpu.data import synthetic_classification_batch
from deltaconv_tpu.models import DeltaNetClassification
from deltaconv_tpu.training import (
    create_train_state,
    make_train_step,
    sgd_momentum,
)

STEPS = 6


def trace(outdir):
    model = DeltaNetClassification(
        num_classes=bench.NUM_CLASSES,
        conv_channels=bench.CONV_CHANNELS,
        num_neighbors=bench.K, dense_operators=True,
        operator_dtype="bfloat16", compute_dtype="bfloat16",
        knn_method="approx",
    )
    batch = synthetic_classification_batch(0, bench.BATCH,
                                           bench.NUM_POINTS,
                                           bench.NUM_CLASSES)
    pos = jnp.asarray(batch["pos"])
    normal = jnp.asarray(batch["normal"])
    label = jnp.asarray(batch["label"])
    state = create_train_state(
        model, jax.random.PRNGKey(0), (pos,), sgd_momentum(0.1),
        init_kwargs={"normal": normal},
    )
    step = jax.jit(make_train_step(model))
    b = {"pos": pos, "normal": normal, "label": label}

    rng = jax.random.PRNGKey(1)
    for _ in range(3):
        state, m = step(state, b, rng)
    jax.device_get(m["loss"])
    jax.profiler.start_trace(outdir, create_perfetto_trace=True)
    for _ in range(STEPS):
        state, m = step(state, b, rng)
    jax.device_get(m["loss"])
    jax.profiler.stop_trace()


if __name__ == "__main__":
    import eval_op_trace
    eval_op_trace.STEPS = STEPS
    out = "/tmp/train_op_trace"
    bench._enable_compile_cache()
    trace(out)
    eval_op_trace.report(out, top=int(sys.argv[1])
                         if len(sys.argv) > 1 else 50)
