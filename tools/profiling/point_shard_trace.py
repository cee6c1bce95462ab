"""Per-scope device trace of the point-sharded large-N forward
(bench.py --mode=point-shard config: ONE 65,536-pt cloud, k=20,
coefficient operators, 1-chip mesh) — finds where the ~seconds go at
large N. Parse with parse_trace.py."""
import sys

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import bench
from deltaconv_tpu.data import synthetic_classification_batch
from deltaconv_tpu.models import DeltaNetClassification
from deltaconv_tpu.parallel.point_sharding import point_sharded_classification


def main(outdir="/tmp/ps_trace", n=65536, steps=3):
    model = DeltaNetClassification(
        num_classes=bench.NUM_CLASSES, conv_channels=bench.CONV_CHANNELS,
        num_neighbors=bench.K, dense_operators=False,
        compute_dtype="bfloat16")
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
    jax.device_get(out)  # block_until_ready lies on the tunnel
    jax.profiler.start_trace(outdir, create_perfetto_trace=True)
    for _ in range(steps):
        out = forward(variables, pos, normal)
    jax.device_get(out)
    jax.profiler.stop_trace()
    print("trace written to", outdir)


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["/tmp/ps_trace"]))
