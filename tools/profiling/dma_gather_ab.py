"""Round-5 eval-representation attempt #2 (r4 verdict item 3): a
Pallas dynamic row-gather — per-edge rows copied from the VMEM-resident
feature table by scalar dynamic slices — vs the one-hot MXU gather
(ops/gather_rows) at the headline conv shape.

RESULT (2026-08-20, the closing negative — PERF.md round 5): the
dynamic row-copy kernel DOES NOT COMPILE on v5e — Mosaic requires
dynamically indexed vector loads to be provably sublane(8)-aligned
("cannot statically prove that index in dimension 1 is a multiple
of 8"); arbitrary per-edge row addressing from VMEM is not
expressible, which is why the one-hot MXU matmul is the TPU-native
gather. Kept as the compiled-attempt artifact; run with
``PYTHONPATH=/root/repo:$PYTHONPATH`` to reproduce the rejection.
(The one-hot timing this script prints is NOT comparable to the
in-model kernels — isolated microbenches inflate on this tunnel,
see PERF.md measurement notes.)"""
import functools
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import bench
from deltaconv_tpu.ops.gather_rows import gather_rows

bench._enable_compile_cache()

B, N, K, C = 32, 1024, 20, 64
T = 128


def _dma_kernel(idx_ref, tab_ref, out_ref, *, k, t):
    def body(e, _):
        i = e // k
        kk = e % k
        v = idx_ref[0, i, kk]
        row = tab_ref[0, pl.ds(v, 1), :]
        out_ref[0, pl.ds(e, 1), :] = row
        return 0

    jax.lax.fori_loop(0, t * k, body, 0)


@jax.jit
def dma_gather(table, idx):
    return pl.pallas_call(
        functools.partial(_dma_kernel, k=K, t=T),
        grid=(B, N // T),
        in_specs=[
            pl.BlockSpec((1, T, K), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, N, C), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T * K, C), lambda ib, it: (ib, it, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N * K, C), jnp.bfloat16),
    )(idx, table)


def timed(f, *args, iters=20):
    out = f(*args)
    jax.device_get(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        jax.device_get(out)
        times.append((time.perf_counter() - t0) / iters * 1000)
    return statistics.median(times)


rng = np.random.default_rng(0)
table = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32)
                    ).astype(jnp.bfloat16)
idx = jnp.asarray(rng.integers(0, N, (B, N, K)).astype(np.int32))

onehot_ms = timed(jax.jit(lambda t, i: gather_rows(t, i)), table, idx)
print(f"one-hot MXU gather (ops/gather_rows): {onehot_ms:.3f} ms")
dma_ms = timed(dma_gather, table, idx)
print(f"Pallas dynamic row-copy gather: {dma_ms:.3f} ms")
print(f"ratio: {dma_ms / onehot_ms:.2f}x")
# Correctness spot check
got = np.asarray(dma_gather(table, idx)[0, :N * K].reshape(N, K, C),
                 np.float32)
want = np.asarray(table, np.float32)[0][np.asarray(idx)[0]]
np.testing.assert_array_equal(got, want)
print("values exact")
