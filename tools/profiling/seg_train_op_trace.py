"""Round-4: FULL op-name device breakdown of the seg TRAIN step
(bench --mode=seg-train config) — the per-stage table VERDICT r3
asked for. Reuses eval_op_trace.report."""
import sys

import jax
import jax.numpy as jnp

import bench
from deltaconv_tpu.data import synthetic_classification_batch
from deltaconv_tpu.models import DeltaNetSegmentation
from deltaconv_tpu.training import (
    create_train_state,
    make_train_step,
    sgd_momentum,
)

STEPS = 6


def trace(outdir):
    b, n = 16, 2048
    model = DeltaNetSegmentation(
        num_classes=50, conv_channels=(64, 128, 256), mlp_depth=2,
        categorical_vector=True, num_neighbors=30,
        dense_operators=True, operator_dtype="bfloat16",
        compute_dtype="bfloat16", knn_method="approx",
    )
    batch = synthetic_classification_batch(0, b, n, 16)
    pos = jnp.asarray(batch["pos"])
    normal = jnp.asarray(batch["normal"])
    cat = jnp.eye(16)[jnp.asarray(batch["label"])]
    labels = jax.random.randint(jax.random.PRNGKey(2), (b, n), 0, 50)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (pos,), sgd_momentum(0.01),
        init_kwargs={"normal": normal, "category": cat})
    step = jax.jit(make_train_step(model, smoothing=0.0,
                                   per_point=True))
    arrays = {"pos": pos, "normal": normal, "category": cat,
              "label": labels}
    rng = jax.random.PRNGKey(1)
    for _ in range(3):
        state, m = step(state, arrays, rng)
    jax.device_get(m["loss"])
    jax.profiler.start_trace(outdir, create_perfetto_trace=True)
    for _ in range(STEPS):
        state, m = step(state, arrays, rng)
    jax.device_get(m["loss"])
    jax.profiler.stop_trace()


if __name__ == "__main__":
    import eval_op_trace
    eval_op_trace.STEPS = STEPS
    out = "/tmp/seg_train_op_trace"
    bench._enable_compile_cache()
    trace(out)
    eval_op_trace.report(out, top=int(sys.argv[1])
                         if len(sys.argv) > 1 else 45)
