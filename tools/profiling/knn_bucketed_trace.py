"""Op-level device trace of the Morton-bucketed kNN at the bench
shape: where do the non-sweep milliseconds go (sort / pregather /
candidate ranking / kernel)? Run with
``PYTHONPATH=/root/repo:$PYTHONPATH``."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import bench
from deltaconv_tpu.data.synthetic import synthetic_classification_batch
from deltaconv_tpu.ops.knn_bucketed import knn_topk_bucketed

sys.path.insert(0, "tools/profiling")
import eval_op_trace  # noqa: E402
eval_op_trace.STEPS = 6
report = eval_op_trace.report

bench._enable_compile_cache()

N, K = 65536, 20
batch = synthetic_classification_batch(1, 1, N, 40)
pos = jnp.asarray(np.asarray(batch["pos"][0], np.float32))

quant = "--exact" not in sys.argv
tq = int(sys.argv[sys.argv.index("--tq") + 1]) if "--tq" in sys.argv else 32
f = jax.jit(lambda p: knn_topk_bucketed(
    p, p, K, tile_q=tq, tile_c=256, m_tiles=24, quantized=quant))
out = f(pos)
jax.device_get(out)

trace_dir = "/tmp/knn_bucketed_trace"
with jax.profiler.trace(trace_dir):
    for _ in range(6):
        out = f(pos)
    jax.device_get(out)
t0 = time.perf_counter()
for _ in range(6):
    out = f(pos)
jax.device_get(out)
print(f"wall: {(time.perf_counter() - t0) / 6 * 1000:.1f} ms/call")
report(trace_dir, top=40)
