"""One-time cache of the bench mesh + a solved velocity field for trace
profiling (benchmarks/_trace_tpu_prof.py iterates on the tracer without
re-paying the Newton compile every run).

Run on TPU: python benchmarks/_trace_field_make.py [lc=0.024]
Writes /tmp/traceprof_<lc>/Velocity.{xdmf,h5} (bench-identical XDMF).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("BENCH_DEADLINE", str(time.time() + 1e9))

import numpy as np

import bench
from stabilized_navier_stokes_flow_fenicsx_tpu.forms.navier_stokes import (
    make_ns_sups_kernel)
from stabilized_navier_stokes_flow_fenicsx_tpu.io.xdmf import (
    write_xdmf_function)


def main():
    lc = float(sys.argv[1]) if len(sys.argv) > 1 else 0.024
    folder = f"/tmp/traceprof_{lc}"
    os.makedirs(folder, exist_ok=True)
    t0 = time.time()
    ctx = bench.build_problem(lc)
    print(f"setup {time.time()-t0:.1f}s ndofs={ctx['W'].ndofs}", flush=True)
    step, tr_s, co_s = bench.aot_newton_step(ctx)
    print(f"newton program trace {tr_s:.1f}s compile {co_s:.1f}s", flush=True)
    kern = make_ns_sups_kernel("tetrahedron", nu=1.0 / 10.0)
    w = ctx["g"]
    for i in range(3):
        t0 = time.time()
        out = step(kern, w)
        rn = float(out.resnorm)
        w = out.x
        print(f"newton it {i} |F|={rn:.3e} ({time.time()-t0:.1f}s)",
              flush=True)
    u, p = ctx["W"].split(np.asarray(w, np.float64))
    write_xdmf_function(f"{folder}/Velocity", ctx["mesh"], np.asarray(u),
                        "Velocity")
    np.save(f"{folder}/seed_points.npy", ctx["inlet1"].mesh.points)
    import shutil
    shutil.copy(ctx["img"], f"{folder}/img.png")
    print(f"saved {folder}", flush=True)


if __name__ == "__main__":
    main()
