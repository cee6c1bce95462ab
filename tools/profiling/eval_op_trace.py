"""Round-4 lever hunt: FULL op-name device breakdown of the exact bf16
eval step (no scope truncation) — locates the unfused elementwise glue,
copies, and reductions between the Pallas kernels."""
import collections
import glob
import gzip
import json
import sys

import jax
import jax.numpy as jnp

import bench
from deltaconv_tpu.data import synthetic_classification_batch

STEPS = 10


def trace(outdir):
    model = bench._build_model()
    batch = synthetic_classification_batch(0, bench.BATCH, bench.NUM_POINTS,
                                           bench.NUM_CLASSES)
    pos = jnp.asarray(batch["pos"])
    normal = jnp.asarray(batch["normal"])
    variables = jax.jit(lambda p, n: model.init(
        jax.random.PRNGKey(0), p, normal=n, train=False))(pos, normal)

    @jax.jit
    def forward(pos, normal):
        return model.apply(variables, pos, normal=normal, train=False)

    for _ in range(5):
        out = forward(pos, normal)
    jax.device_get(out)
    jax.profiler.start_trace(outdir, create_perfetto_trace=True)
    for _ in range(STEPS):
        out = forward(pos, normal)
    jax.device_get(out)
    jax.profiler.stop_trace()


def report(outdir, top=60):
    path = sorted(glob.glob(outdir + "/**/*.trace.json.gz",
                            recursive=True))[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    ev = data["traceEvents"] if isinstance(data, dict) else data
    names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e.get("pid")] = e["args"]["name"]
    dev_pids = {p for p, v in names.items() if "TPU" in v}
    tot = collections.Counter()
    cnt = collections.Counter()
    module = 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3 / STEPS
        if name.startswith("jit_"):  # whole-module spans (any jit name)
            module += dur
            continue
        tot[name] += dur
        cnt[name] += 1
    print(f"module busy/step: {module:.3f} ms")
    acc = 0.0
    for k, v in tot.most_common(top):
        acc += v
        print(f"{v:8.4f} ms x{cnt[k]//STEPS:<3d} {k[:150]}")
    rest = sum(tot.values()) - acc
    print(f"{rest:8.4f} ms  (everything below top {top})")


if __name__ == "__main__":
    out = "/tmp/eval_op_trace"
    bench._enable_compile_cache()
    trace(out)
    report(out, top=int(sys.argv[1]) if len(sys.argv) > 1 else 60)
