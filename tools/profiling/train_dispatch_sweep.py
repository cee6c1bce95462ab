"""Separate fixed dispatch/sync latency from true per-step device cost:
time the scan-of-S train program at several S. Slope = per-step device
cost; intercept = per-window round-trip overhead (the remote tunnel)."""
import time, statistics, json
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

def make_multi(S):
    @jax.jit
    def multi(state, batch, rng):
        def body(carry, _):
            st, rg = carry
            rg, sub = jax.random.split(rg)
            st, metrics = step(st, batch, sub)
            return (st, rg), metrics["loss"]
        (state, _), losses = jax.lax.scan(body, (state, rng), jnp.arange(S))
        return state, losses
    return multi

# no-op sync round-trip floor
@jax.jit
def noop(x):
    return x + 1.0
x = jnp.zeros((8,))
for _ in range(3):
    noop(x).block_until_ready()
ts = []
for _ in range(10):
    t0 = time.perf_counter()
    noop(x).block_until_ready()
    ts.append((time.perf_counter() - t0) * 1e3)
res = {"noop_rtt_ms": round(statistics.median(ts), 2)}

rng = jax.random.PRNGKey(1)
for S in (5, 10, 20):  # S=50's remote compile exceeds 10 min
    multi = make_multi(S)
    st, losses = multi(state, arrays, rng)
    losses.block_until_ready()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        st, losses = multi(state, arrays, rng)
        losses.block_until_ready()
        times.append((time.perf_counter() - t0) / S * 1e3)
    res[f"scan{S}_ms_per_step"] = round(statistics.median(times), 2)
print(json.dumps(res))
