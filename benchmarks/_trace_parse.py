"""Re-parse a jax.profiler perfetto trace: leaf self-times bucketed by the
JAX scope path in event args (tf_op/long_name), which maps HLO fusions
back to source regions (newton body / fgmres / mg pc build / assembly).

Run: python benchmarks/_trace_parse.py /tmp/step_trace
"""
import glob
import gzip
import json
import sys
from collections import defaultdict

tdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/step_trace"
paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)

# inspect arg keys first
for p in paths:
    with gzip.open(p, "rt") as f:
        data = json.load(f)
    evs = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]
    pid_name = {e["pid"]: e["args"].get("name", "")
                for e in data.get("traceEvents", [])
                if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = [e for e in evs if "TPU" in pid_name.get(e["pid"], "")
           or "Device" in pid_name.get(e["pid"], "")]
    print(f"{p}: {len(dev)} device X events")
    # sample args
    seen = set()
    for e in dev[:4000]:
        ks = tuple(sorted((e.get("args") or {}).keys()))
        if ks not in seen:
            seen.add(ks)
            print("  arg keys:", ks, "| name:", e.get("name", "")[:60])
            for k, v in (e.get("args") or {}).items():
                print(f"    {k}: {str(v)[:140]}")
            if len(seen) > 6:
                break

    # self-time per track
    by_track = defaultdict(list)
    for e in dev:
        by_track[(e["pid"], e["tid"])].append(e)
    agg = defaultdict(float)
    for evl in by_track.values():
        evl.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        # compute child-time per event via a stack
        stack = []
        child = {id(e): 0.0 for e in evl}
        for e in evl:
            ts, dur = e["ts"], e.get("dur", 0)
            while stack and ts >= stack[-1]["ts"] + stack[-1].get("dur", 0):
                stack.pop()
            if stack:
                child[id(stack[-1])] += dur
            stack.append(e)
        for e in evl:
            self_t = (e.get("dur", 0) - child[id(e)]) / 1e6
            args = e.get("args") or {}
            scope = args.get("tf_op") or args.get("long_name") or ""
            key = (e.get("name", "?")[:60], str(scope)[:160])
            agg[key] += self_t
    tot = sum(agg.values())
    print(f"total self time {tot:.3f}s")
    for (name, scope), t in sorted(agg.items(), key=lambda kv: -kv[1])[:45]:
        print(f"{t:8.3f}s  {name}")
        if scope:
            print(f"           {scope}")
