"""Round-4 point-shard lever hunt: FULL op-name device breakdown of
the point-sharded 65,536-pt forward (bench --mode=point-shard config)
— itemizes the ~160 ms gather/convert tail next to the table-kNN cost.
Usage: ps_op_trace.py [exact|approx] [N]."""
import sys

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import bench
from deltaconv_tpu.data import synthetic_classification_batch
from deltaconv_tpu.models import DeltaNetClassification
from deltaconv_tpu.parallel.point_sharding import (
    point_sharded_classification,
)
from eval_op_trace import report

STEPS = 3


def main(knn_method="exact", n=65536, outdir="/tmp/ps_op_trace"):
    model = DeltaNetClassification(
        num_classes=bench.NUM_CLASSES, conv_channels=bench.CONV_CHANNELS,
        num_neighbors=bench.K, dense_operators=False,
        compute_dtype="bfloat16", knn_method=knn_method)
    small = synthetic_classification_batch(0, 1, 256, bench.NUM_CLASSES)
    variables = jax.jit(lambda p, nn: model.init(
        jax.random.PRNGKey(0), p, normal=nn, train=False))(
        jnp.asarray(small["pos"][0]), jnp.asarray(small["normal"][0]))
    batch = synthetic_classification_batch(1, 1, n, bench.NUM_CLASSES)
    pos = jnp.asarray(batch["pos"][0])
    normal = jnp.asarray(batch["normal"][0])
    mesh = Mesh(jax.devices(), ("points",))

    @jax.jit
    def forward(variables, pos, normal):
        return point_sharded_classification(mesh, model, variables, pos,
                                            normal=normal)

    out = forward(variables, pos, normal)
    jax.device_get(out)
    jax.profiler.start_trace(outdir, create_perfetto_trace=True)
    for _ in range(STEPS):
        out = forward(variables, pos, normal)
    jax.device_get(out)
    jax.profiler.stop_trace()


if __name__ == "__main__":
    import eval_op_trace
    eval_op_trace.STEPS = STEPS
    method = sys.argv[1] if len(sys.argv) > 1 else "exact"
    out = f"/tmp/ps_op_trace_{method}"
    bench._enable_compile_cache()
    main(method, outdir=out)
    report(out, top=40)
