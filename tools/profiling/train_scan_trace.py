import jax, jax.numpy as jnp
import bench
from deltaconv_tpu.data import synthetic_classification_batch
from deltaconv_tpu.training import create_train_state, make_train_step, sgd_momentum

bench._enable_compile_cache()
model = bench._build_model()
batch = synthetic_classification_batch(0, bench.BATCH, bench.NUM_POINTS, bench.NUM_CLASSES)
pos = jnp.asarray(batch["pos"])
state = create_train_state(model, jax.random.PRNGKey(0), (pos,), sgd_momentum(0.01),
                           init_kwargs={"normal": jnp.asarray(batch["normal"])})
step = make_train_step(model, smoothing=0.2)
arrays = {k: jnp.asarray(v) for k, v in batch.items()}
S = 10

@jax.jit
def multi(state, batch, rng):
    def body(carry, _):
        st, rg = carry
        rg, sub = jax.random.split(rg)
        st, metrics = step(st, batch, sub)
        return (st, rg), metrics["loss"]
    (state, _), losses = jax.lax.scan(body, (state, rng), jnp.arange(S))
    return state, losses

rng = jax.random.PRNGKey(1)
st, losses = multi(state, arrays, rng)
losses.block_until_ready()
jax.profiler.start_trace("/tmp/scan_trace", create_perfetto_trace=True)
st, losses = multi(state, arrays, rng)
losses.block_until_ready()
jax.profiler.stop_trace()
print("trace done")
