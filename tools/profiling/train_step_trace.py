import jax, jax.numpy as jnp
import bench
from deltaconv_tpu.data import synthetic_classification_batch
from deltaconv_tpu.training import create_train_state, make_train_step, sgd_momentum

bench._enable_compile_cache()
model = bench._build_model().clone()
batch = synthetic_classification_batch(0, bench.BATCH, bench.NUM_POINTS, bench.NUM_CLASSES)
pos = jnp.asarray(batch["pos"])
state = create_train_state(model, jax.random.PRNGKey(0), (pos,), sgd_momentum(0.01),
                           init_kwargs={"normal": jnp.asarray(batch["normal"])})
step = make_train_step(model, smoothing=0.2)
arrays = {k: jnp.asarray(v) for k, v in batch.items()}
rng = jax.random.PRNGKey(1)
for _ in range(3):
    state, m = step(state, arrays, rng)
jax.block_until_ready(m["loss"])
jax.profiler.start_trace("/tmp/train_trace", create_perfetto_trace=True)
for _ in range(6):
    state, m = step(state, arrays, rng)
jax.block_until_ready(m["loss"])
jax.profiler.stop_trace()
print("trace done")
