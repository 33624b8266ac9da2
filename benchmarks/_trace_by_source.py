"""Aggregate device self-time by source file:line from a jax.profiler
perfetto trace.  Run: python benchmarks/_trace_by_source.py /tmp/step_trace
"""
import glob
import gzip
import json
import sys
from collections import defaultdict

tdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/step_trace"
paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)

for p in paths:
    with gzip.open(p, "rt") as f:
        data = json.load(f)
    meta = [e for e in data.get("traceEvents", []) if e.get("ph") == "M"]
    pid_name = {e["pid"]: e["args"].get("name", "") for e in meta
                if e.get("name") == "process_name"}
    evs = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"
           and ("TPU" in pid_name.get(e["pid"], "")
                or "Device" in pid_name.get(e["pid"], ""))]
    by_track = defaultdict(list)
    for e in evs:
        by_track[(e["pid"], e["tid"])].append(e)
    agg = defaultdict(float)
    cat_agg = defaultdict(float)
    for evl in by_track.values():
        evl.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []
        child = {}
        for e in evl:
            ts, dur = e["ts"], e.get("dur", 0)
            while stack and ts >= stack[-1]["ts"] + stack[-1].get("dur", 0):
                stack.pop()
            if stack:
                child[id(stack[-1])] = child.get(id(stack[-1]), 0.0) + dur
            stack.append(e)
        for e in evl:
            self_t = (e.get("dur", 0) - child.get(id(e), 0.0)) / 1e6
            if self_t <= 0:
                continue
            args = e.get("args") or {}
            src = args.get("source", "")
            src = src.replace(
                "/root/repo/stabilized_navier_stokes_flow_fenicsx_tpu/", "")
            cat = args.get("hlo_category", "?")
            agg[(src, cat)] += self_t
            cat_agg[cat] += self_t
    tot = sum(cat_agg.values())
    print(f"== total device self time {tot:.3f}s")
    print("-- by hlo category:")
    for c, t in sorted(cat_agg.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{t:8.3f}s  {c}")
    print("-- by source line x category:")
    for (src, cat), t in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{t:8.3f}s  {cat:22s} {src}")
