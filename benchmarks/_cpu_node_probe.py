#!/usr/bin/env python
"""CPU-node stand-in datapoint (VERDICT round-4 item 7).

BASELINE.md requires the CPU side of the north-star comparison to be
*measured*, but FEniCSx/PETSc is not installable in this image
(tests/parity_fixtures.py:4-5).  Stand-in: this framework's own CPU
backend in f64 (the reference's PETSc precision,
NavierStokesChannelFlow.py:299 is the reference's only timing) running
the IDENTICAL algorithm — layered assembly, stepped Newton with the
mg-Chebyshev PC, same capped inner solve as the bench headline — at the
bench mesh on this host.

This host exposes ONE vCPU.  A production "64-core CPU node" divides the
bandwidth/compute phases by at most the core count (PETSc strong-scales
sublinearly on SpMV-bound work); BASELINE.md records the single-core
number and states that caveat rather than fabricating a 64-core figure.

Usage: python benchmarks/_cpu_node_probe.py [lc=0.024] [budget_s=5400]
Prints one JSON line (cpu_* keys).
"""

import json
import os
import sys
import time

os.environ["BENCH_CPU"] = "1"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# f64 throughout: the reference's PETSc stack is double precision
jax.config.update("jax_enable_x64", True)


def main():
    lc = float(sys.argv[1]) if len(sys.argv) > 1 else 0.024
    budget = float(sys.argv[2]) if len(sys.argv) > 2 else 5400.0
    deadline = time.time() + budget
    os.environ["BENCH_DEADLINE"] = str(deadline)

    import bench
    from stabilized_navier_stokes_flow_fenicsx_tpu.assemble.layered import (
        layered_matvec, matrix_values_layered, residual_layered)
    from stabilized_navier_stokes_flow_fenicsx_tpu.forms.navier_stokes import (
        make_ns_sups_kernel)

    t0 = time.time()
    ctx = bench.build_problem(lc)
    setup_s = time.time() - t0
    lp, g = ctx["lp"], ctx["g"]
    info = {
        "metric": "cpu_node_standin",
        "host": "1 vCPU (this image)",
        "dtype": str(g.dtype),
        "ndofs": ctx["W"].ndofs,
        "n_cells": ctx["mesh"].n_cells,
        "lc": lc,
        "cpu_setup_s": round(setup_s, 1),
    }
    sys.stderr.write(f"cpu_probe: setup {setup_s:.1f}s "
                     f"ndofs={ctx['W'].ndofs} dtype={g.dtype}\n")

    kern = make_ns_sups_kernel("tetrahedron", nu=1.0 / 10.0)

    # isolated phases first (cheap, and they survive a later timeout)
    def once(label, fn):
        t1 = time.time()
        out = fn()
        jax.block_until_ready(out)
        warm = time.time() - t1           # includes compile
        t1 = time.time()
        out = fn()
        jax.block_until_ready(out)
        dt = time.time() - t1
        info[label] = round(dt, 3)
        sys.stderr.write(f"cpu_probe: {label} {dt:.3f}s "
                         f"(first {warm:.1f}s)\n")
        return out

    once("cpu_resid_s", lambda: residual_layered(
        kern, lp.n2d, lp.n_planes, lp.bs, lp.arrays, g))
    V = once("cpu_jac_s", lambda: matrix_values_layered(
        kern, lp.E, lp.n_planes, lp.bs, lp.arrays, g))
    once("cpu_spmv_s", lambda: layered_matvec(
        lp.arrays, lp.n2d, lp.n_planes, V, g))
    print(json.dumps(info), flush=True)   # phases are on record

    # the headline program: one Newton step, same statics as bench
    t0 = time.time()
    step, trace_s, compile_s = bench.aot_newton_step(ctx)
    info["cpu_newton_compile_s"] = round(trace_s + compile_s, 1)
    sys.stderr.write(f"cpu_probe: newton trace {trace_s:.1f}s "
                     f"compile {compile_s:.1f}s\n")

    per = []
    w = g
    for i in range(5):
        t1 = time.time()
        out = step(kern, w)
        rn = float(out.resnorm)
        dt = time.time() - t1
        per.append(round(dt, 2))
        w = out.x
        sys.stderr.write(f"cpu_probe: step {i} {dt:.1f}s |F|={rn:.3e}\n")
        info.update(cpu_per_step_s=per,
                    cpu_step_s=round(min(per), 2),
                    cpu_headline5_s=round(5 * min(per), 1),
                    cpu_headline5_extrapolated=len(per) < 5)
        print(json.dumps(info), flush=True)
        if time.time() + dt > deadline:
            sys.stderr.write("cpu_probe: budget — stopping\n")
            break
    if len(per) == 5:
        info["cpu_headline5_s"] = round(sum(per), 1)
        info["cpu_headline5_extrapolated"] = False
        print(json.dumps(info), flush=True)


if __name__ == "__main__":
    main()
