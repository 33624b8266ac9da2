"""Profile ONE warm headline Newton step with jax.profiler and print the
top device ops by self time (parsed from the perfetto trace).

Run: python benchmarks/_step_profile.py [lc] [pc]
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

lc = float(sys.argv[1]) if len(sys.argv) > 1 else 0.024
pc = sys.argv[2] if len(sys.argv) > 2 else "mg_cheby6_bf16"

import bench

os.environ.setdefault("BENCH_DEADLINE", str(time.time() + 3600))
ctx = bench.build_problem(lc)
print(f"ndofs={ctx['W'].ndofs}", flush=True)

from stabilized_navier_stokes_flow_fenicsx_tpu.forms.navier_stokes import (
    make_ns_sups_kernel)

kern = make_ns_sups_kernel("tetrahedron", nu=1.0 / 10.0)
call, trace_s, compile_s = bench.aot_newton_step(ctx, pc=pc)
print(f"trace {trace_s:.1f}s compile {compile_s:.1f}s", flush=True)

# warm: two steps (compile + get to an evolved state like bench steps 1+)
out = call(kern, ctx["g"])
w = out.x
float(out.resnorm)
t0 = time.time()
out = call(kern, w)
w2 = out.x
float(out.resnorm)
print(f"warm step {time.time() - t0:.2f}s", flush=True)

tdir = "/tmp/step_trace"
os.system(f"rm -rf {tdir}")
with jax.profiler.trace(tdir):
    out = call(kern, w)
    float(out.resnorm)

# parse the perfetto trace: sum durations per op name on device tracks
paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
print("trace files:", paths, flush=True)
agg = defaultdict(float)
total = 0.0
for p in paths:
    with gzip.open(p, "rt") as f:
        data = json.load(f)
    pid_name = {}
    tid_name = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_name[ev["pid"]] = ev["args"].get("name", "")
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tid_name[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pn = pid_name.get(ev["pid"], "")
        if "TPU" not in pn and "tpu" not in pn and "Device" not in pn:
            continue
        tn = tid_name.get((ev["pid"], ev["tid"]), "")
        if "step" in tn.lower() or "launch" in tn.lower():
            continue
        dur = ev.get("dur", 0) / 1e6
        name = ev.get("name", "?")
        agg[name] += dur
        total += dur

print(f"total device op time: {total:.3f}s")
for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{dur:8.3f}s  {name[:110]}")
