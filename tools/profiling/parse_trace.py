"""Parse a jax perfetto trace: sum device-track event durations by op
scope (first two '/'-separated components of the event name)."""
import gzip, json, sys, collections, glob

path = sorted(glob.glob(sys.argv[1] + "/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(path, "rt") as f:
    data = json.load(f)
ev = data["traceEvents"] if isinstance(data, dict) else data
# Identify device threads: pid/tid names containing "TPU"/"device"
names = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") in ("process_name", "thread_name"):
        names[(e.get("pid"), e.get("tid"), e["name"])] = e["args"]["name"]
dev_pids = {p for (p, t, k), v in names.items()
            if k == "process_name" and ("TPU" in v or "/device" in v.lower())}
print("processes:", sorted({v for (p,t,k),v in names.items() if k=="process_name"}), file=sys.stderr)
tot = collections.Counter(); cnt = collections.Counter(); total = 0.0
for e in ev:
    if e.get("ph") != "X" or e.get("pid") not in dev_pids:
        continue
    name = e.get("name", "")
    dur = e.get("dur", 0) / 1e3  # us -> ms
    total += dur
    parts = name.split("/")
    key = "/".join(parts[:3]) if len(parts) > 2 else name
    tot[key] += dur; cnt[key] += 1
print(f"TOTAL device ms (all steps): {total:.2f}")
for k, v in tot.most_common(40):
    print(f"{v:9.3f} ms  x{cnt[k]:<4d} {k}")
