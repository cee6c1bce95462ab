"""A/B: Morton-bucketed vs quadratic table kNN on the real chip at the
point-shard bench shape (Nq = Nt = 65536, k = 20, the bench's actual
synthetic cloud). Prints ms per call and the quantized-mode recall vs
the exact quadratic reference. Run with
``PYTHONPATH=/root/repo:$PYTHONPATH``."""
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import bench
from deltaconv_tpu.data.synthetic import synthetic_classification_batch
from deltaconv_tpu.ops.knn_bucketed import knn_topk_bucketed
from deltaconv_tpu.ops.knn_topk import knn_topk_table

bench._enable_compile_cache()

N, K = 65536, 20
batch = synthetic_classification_batch(1, 1, N, 40)
pos = jnp.asarray(np.asarray(batch["pos"][0], np.float32))


def timed(f, iters=3):
    out = f(pos)
    jax.device_get(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(pos)
        jax.device_get(out)
        times.append((time.perf_counter() - t0) / iters * 1000)
    return statistics.median(times), out


ref_ms, ref = timed(jax.jit(
    lambda p: knn_topk_table(p, p, K, quantized=True)))
print(f"quadratic quantized (current bench path): {ref_ms:.1f} ms")
exact_ms, exact = timed(jax.jit(lambda p: knn_topk_table(p, p, K)))
print(f"quadratic exact: {exact_ms:.1f} ms")
refn = np.asarray(exact)

configs = [(64, 256, 24), (64, 256, 32), (128, 256, 24), (64, 512, 12),
           (96, 256, 24)]
if len(sys.argv) > 1:
    configs = [tuple(int(x) for x in sys.argv[1].split(","))]

for tq, tc, m in configs:
    for quant in (True, False):
        ms, out = timed(jax.jit(lambda p: knn_topk_bucketed(
            p, p, K, tile_q=tq, tile_c=tc, m_tiles=m, quantized=quant)))
        outn = np.asarray(out)
        hits = sum(len(set(refn[i]) & set(outn[i]))
                   for i in range(0, N, 7))
        rec = hits / (len(range(0, N, 7)) * K)
        tag = "quant" if quant else "exact"
        print(f"bucketed {tag} tile_q={tq} tile_c={tc} m={m}: "
              f"{ms:.1f} ms  recall={rec:.5f}")
