"""Round-5: FULL op-name device breakdown of the point-sharded
65,536-pt TRAIN step (bench --mode=point-shard-train config) — the
stage table the r4 verdict asked for. Usage:
ps_train_op_trace.py [approx|exact] [N]."""
import sys

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import bench
from deltaconv_tpu.data import synthetic_classification_batch
from deltaconv_tpu.models import DeltaNetClassification
from deltaconv_tpu.parallel.point_sharding import (
    point_sharded_train_step,
)
from deltaconv_tpu.training import create_train_state, sgd_momentum
from eval_op_trace import report

STEPS = 1


def main(knn_method="approx", n=65536, outdir="/tmp/ps_train_trace"):
    model = DeltaNetClassification(
        num_classes=bench.NUM_CLASSES, conv_channels=bench.CONV_CHANNELS,
        num_neighbors=bench.K, dense_operators=False,
        compute_dtype="bfloat16", knn_method=knn_method)
    small = synthetic_classification_batch(0, 1, 256, bench.NUM_CLASSES)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (jnp.asarray(small["pos"][0]),),
        sgd_momentum(0.01),
        init_kwargs={"normal": jnp.asarray(small["normal"][0])})
    batch = synthetic_classification_batch(1, 1, n, bench.NUM_CLASSES)
    pos = jnp.asarray(batch["pos"][0])
    normal = jnp.asarray(batch["normal"][0])
    label = jnp.asarray(batch["label"][0])
    mesh = Mesh(jax.devices(), ("points",))
    step = jax.jit(point_sharded_train_step(mesh, model))

    rng = jax.random.PRNGKey(1)
    state, metrics = step(state, pos, normal, label, rng)
    jax.device_get(metrics["loss"])
    # Host tracing off: the 650 ms sharded train step floods the 1M
    # trace-event cap from the host track alone, dropping every device
    # event.
    opts = jax.profiler.ProfileOptions()
    opts.host_tracer_level = 0
    jax.profiler.start_trace(outdir, profiler_options=opts)
    for _ in range(STEPS):
        state, metrics = step(state, pos, normal, label, rng)
    jax.device_get(metrics["loss"])
    jax.profiler.stop_trace()


if __name__ == "__main__":
    import eval_op_trace
    eval_op_trace.STEPS = STEPS
    method = sys.argv[1] if len(sys.argv) > 1 else "approx"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    out = f"/tmp/ps_train_trace_{method}_{n}"
    bench._enable_compile_cache()
    main(method, n=n, outdir=out)
    report(out, top=45)
