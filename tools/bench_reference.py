"""Measured baseline: the EXECUTED reference vs this framework, CPU.

BASELINE.md's reference throughput was an order-of-magnitude estimate
(the reference publishes no numbers and its CUDA deps aren't
installed). This script produces a MEASURED, same-host comparison
instead: it runs the actual upstream implementation (/root/reference,
via tools/pyg_shims.py) and this framework on the SAME CPU at the
headline configuration (B=32, N=1024, k=20, channels [64,64,128,256],
eval forward INCLUDING per-step kNN + operator construction), and
prints one JSON line with both numbers.

The shims are vectorized native-torch (index_add/scatter_reduce/CSR
spmm) — the same machinery torch_scatter/torch_sparse dispatch to on
CPU — so the reference is not handicapped by the substitution.

Usage:  python tools/bench_reference.py [--batch 32] [--points 1024]
        [--iters 3] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_reference_cpu(b, n, k, iters):
    import torch

    from tools.pyg_shims import Data, load_reference

    ref = load_reference()
    torch.manual_seed(0)
    pos = torch.randn(b * n, 3)
    normal = torch.nn.functional.normalize(torch.randn(b * n, 3), dim=-1)
    batch = torch.arange(b).repeat_interleave(n)
    model = ref.models.DeltaNetClassification(
        in_channels=3, num_classes=40, num_neighbors=k)
    model.eval()
    data = Data(pos=pos, batch=batch, norm=normal)
    with torch.no_grad():
        model(data)  # warmup (allocator, autotune)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = model(data)
            times.append(time.perf_counter() - t0)
    assert out.shape == (b, 40)
    return b / statistics.median(times)


def bench_ours_cpu(b, n, k, iters):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from deltaconv_tpu.data import synthetic_classification_batch
    from deltaconv_tpu.models import DeltaNetClassification

    # f32 exact semantics — the apples-to-apples CPU configuration
    # (the reference runs f32; bf16 is a TPU serving choice).
    model = DeltaNetClassification(
        num_classes=40, num_neighbors=k, dense_operators=True,
        knn_method="exact")
    batch = synthetic_classification_batch(0, b, n, 40)
    pos = jnp.asarray(batch["pos"])
    normal = jnp.asarray(batch["normal"])
    variables = jax.jit(
        lambda p, nn: model.init(jax.random.PRNGKey(0), p, normal=nn,
                                 train=False))(pos, normal)
    fwd = jax.jit(lambda p, nn: model.apply(variables, p, normal=nn,
                                            train=False))
    fwd(pos, normal).block_until_ready()  # compile + warmup
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fwd(pos, normal)
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    return b / statistics.median(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--quick", action="store_true",
                    help="B=4, N=256 smoke configuration")
    args = ap.parse_args()
    b, n = (4, 256) if args.quick else (args.batch, args.points)

    ref_cps = bench_reference_cpu(b, n, args.k, args.iters)
    ours_cps = bench_ours_cpu(b, n, args.k, args.iters)
    print(json.dumps({
        "config": {"batch": b, "points": n, "k": args.k,
                   "cpus": os.cpu_count()},
        "reference_cpu_clouds_per_sec": round(ref_cps, 2),
        "ours_cpu_clouds_per_sec": round(ours_cps, 2),
        "same_host_speedup": round(ours_cps / ref_cps, 2),
    }))


if __name__ == "__main__":
    main()
