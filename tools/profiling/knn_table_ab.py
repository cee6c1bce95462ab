"""A/B: exact vs quantized knn_topk_table on the real chip at the
point-shard bench shape (Nq = Nt = 65536, k = 20)."""
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

import bench
from deltaconv_tpu.ops.knn_topk import knn_topk_table

bench._enable_compile_cache()

N, K = 65536, 20
rng = np.random.default_rng(0)
pos = jnp.asarray(rng.random((N, 3)).astype(np.float32))


def run(quantized, tile_q=256, tile_c=2048, iters=3):
    f = jax.jit(lambda p: knn_topk_table(p, p, K, quantized=quantized,
                                         tile_q=tile_q, tile_c=tile_c))
    out = f(pos)
    jax.device_get(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(pos)
        jax.device_get(out)
        times.append((time.perf_counter() - t0) / iters * 1000)
    return statistics.median(times)


for tq, tc in ((256, 2048), (256, 4096), (512, 2048)):
    e = run(False, tq, tc)
    q = run(True, tq, tc)
    print(f"tile_q={tq} tile_c={tc}: exact {e:.1f} ms  quantized {q:.1f} ms")
