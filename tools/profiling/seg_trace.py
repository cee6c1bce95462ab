import json, time, glob, gzip, sys
import jax, jax.numpy as jnp
import bench
from deltaconv_tpu.data import synthetic_classification_batch
from deltaconv_tpu.models import DeltaNetSegmentation

bench._enable_compile_cache()
b, n = 16, 2048
model = DeltaNetSegmentation(
    num_classes=50, conv_channels=(64, 128, 256), mlp_depth=2,
    categorical_vector=True, num_neighbors=30,
    dense_operators=True, operator_dtype="bfloat16",
    compute_dtype="bfloat16", knn_method="approx",
)
batch = synthetic_classification_batch(0, b, n, 16)
pos = jnp.asarray(batch["pos"]); normal = jnp.asarray(batch["normal"])
cat = jnp.eye(16)[jnp.asarray(batch["label"])]
variables = jax.jit(lambda p, nn, c: model.init(
    jax.random.PRNGKey(0), p, normal=nn, category=c, train=False))(pos, normal, cat)

@jax.jit
def forward(pos, normal, cat):
    return model.apply(variables, pos, normal=normal, category=cat, train=False)

for _ in range(5):
    out = forward(pos, normal, cat)
out.block_until_ready()

jax.profiler.start_trace("/tmp/seg_trace", create_perfetto_trace=True)
for _ in range(10):
    out = forward(pos, normal, cat)
out.block_until_ready()
jax.profiler.stop_trace()
print("trace done")
