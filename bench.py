"""Throughput benchmark: operator construction + forward pass.

Measures point clouds/second through the flagship configuration of the
BASELINE metric (BASELINE.md): DeltaNetClassification forward including
per-step kNN + tangent frames + WLS grad/div operator construction, at
1024 points, k=20, reference channels [64, 64, 128, 256].

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clouds/sec", "vs_baseline": N}

``vs_baseline`` compares against an ESTIMATED PyTorch-reference A100
throughput (the reference publishes no numbers — BASELINE.md). The
estimate is a constant documented below; replace it with a measured
number when one exists.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

# Estimated reference throughput (clouds/sec) of the PyTorch
# implementation on one A100 at batch 32, 1024 pts, k=20: operator
# construction (~45% of step: batched SVD-free tangent frames are given
# normals here; knn + WLS inverse + sparse assembly) + forward. DGCNN-
# class models with per-step graph builds measure ~1k clouds/s on A100;
# DeltaConv adds the WLS solve. No published number exists
# (BASELINE.md), so this is an order-of-magnitude anchor, not a
# measurement.
ESTIMATED_REFERENCE_A100_CLOUDS_PER_SEC = 1000.0

BATCH = 32
NUM_POINTS = 1024
K = 20
CONV_CHANNELS = (64, 64, 128, 256)
NUM_CLASSES = 40


def main():
    from deltaconv_tpu.data import synthetic_classification_batch
    from deltaconv_tpu.models import DeltaNetClassification

    # Production serving config: bf16 matmuls/activations with f32
    # BatchNorm statistics and parameters (tests pin logit agreement
    # with the f32 path), bf16 dense operators, approximate kNN
    # (>0.98 recall). The geometry/WLS pipeline stays f32.
    model = DeltaNetClassification(
        num_classes=NUM_CLASSES,
        conv_channels=CONV_CHANNELS,
        num_neighbors=K,
        dense_operators=True,
        operator_dtype="bfloat16",
        compute_dtype="bfloat16",
        knn_method="approx",
    )
    batch = synthetic_classification_batch(0, BATCH, NUM_POINTS, NUM_CLASSES)
    pos = jnp.asarray(batch["pos"])
    normal = jnp.asarray(batch["normal"])

    variables = jax.jit(
        lambda p, n: model.init(jax.random.PRNGKey(0), p, normal=n,
                                train=False)
    )(pos, normal)

    @jax.jit
    def forward(pos, normal):
        return model.apply(variables, pos, normal=normal, train=False)

    # Warmup / compile.
    forward(pos, normal).block_until_ready()

    # Timed loop.
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(pos, normal)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    clouds_per_sec = BATCH * iters / dt
    print(json.dumps({
        "metric": "clouds/sec (operator build + forward, 1024 pts, k=20, "
                  "batch 32)",
        "value": round(clouds_per_sec, 1),
        "unit": "clouds/sec",
        "vs_baseline": round(
            clouds_per_sec / ESTIMATED_REFERENCE_A100_CLOUDS_PER_SEC, 3
        ),
    }))


if __name__ == "__main__":
    main()
