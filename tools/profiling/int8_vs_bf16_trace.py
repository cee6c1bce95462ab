"""VERDICT #8: per-scope device comparison of the int8 serving step vs
the exact bf16 step — where the promised 2x on the dominant contraction
goes. Traces both modes back-to-back and prints per-scope deltas."""
import collections
import glob
import gzip
import json

import jax
import jax.numpy as jnp

import bench
from deltaconv_tpu.data import synthetic_classification_batch


def trace_mode(operator_dtype, outdir):
    model = bench._build_model()
    if operator_dtype:
        model = model.clone(operator_dtype=operator_dtype)
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
    out.block_until_ready()
    jax.profiler.start_trace(outdir, create_perfetto_trace=True)
    for _ in range(10):
        out = forward(pos, normal)
    out.block_until_ready()
    jax.profiler.stop_trace()


def scope_ms(outdir, steps=10):
    path = sorted(glob.glob(outdir + "/**/*.trace.json.gz",
                            recursive=True))[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    ev = data["traceEvents"] if isinstance(data, dict) else data
    names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") in ("process_name",):
            names[e.get("pid")] = e["args"]["name"]
    dev_pids = {p for p, v in names.items() if "TPU" in v}
    tot = collections.Counter()
    module_total = 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3 / steps
        if name.startswith("jit_forward"):
            module_total += dur
            continue
        parts = name.split("/")
        key = "/".join(parts[:3]) if len(parts) > 2 else name
        tot[key] += dur
    return module_total, tot


bench._enable_compile_cache()
trace_mode(None, "/tmp/bf16_eval_trace")
trace_mode("int8", "/tmp/int8_eval_trace")

m16, t16 = scope_ms("/tmp/bf16_eval_trace")
m8, t8 = scope_ms("/tmp/int8_eval_trace")
print(f"module busy/step: bf16 {m16:.3f} ms  int8 {m8:.3f} ms")
keys = sorted(set(t16) | set(t8),
              key=lambda k: -(t16.get(k, 0) + t8.get(k, 0)))
print(f"{'scope':44s} {'bf16':>8s} {'int8':>8s} {'delta':>8s}")
for k in keys[:35]:
    a, b = t16.get(k, 0.0), t8.get(k, 0.0)
    if a + b < 0.02:
        continue
    print(f"{k:44s} {a:8.3f} {b:8.3f} {b - a:+8.3f}")
