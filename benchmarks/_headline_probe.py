"""Probe: per-step KSP iteration counts + wall time of the EXACT headline
bench program (bench.py::run_bench shape, warm persistent cache).

Prints, per Newton step: wall seconds, |F| after step, line-search lambda,
KSP iters, KSP final relative resnorm.  Tells us whether the headline's
inner FGMRES (rtol 1e-3, cap 4x50=200) converges or hits the cap — the
difference decides whether smoother strength or per-apply cost is the
next perf lever.

Run: python benchmarks/_headline_probe.py [lc] [pc]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

lc = float(sys.argv[1]) if len(sys.argv) > 1 else 0.024
pc = sys.argv[2] if len(sys.argv) > 2 else "mg_cheby6_bf16"

import bench

os.environ.setdefault("BENCH_DEADLINE", str(time.time() + 3600))
t0 = time.time()
mesh, W, lp, mask, g, g64, hier = bench.build_problem(lc)
print(f"setup {time.time() - t0:.1f}s ndofs={W.ndofs} cells={mesh.n_cells}",
      flush=True)

from stabilized_navier_stokes_flow_fenicsx_tpu.forms.navier_stokes import (
    make_ns_sups_kernel)

kern = make_ns_sups_kernel("tetrahedron", nu=1.0 / 10.0)
step = bench.make_step(kern, lp, mask, g, hier)

w = g
for i in range(5):
    t1 = time.time()
    out = step(w, 1e-3, 4, pc=pc)
    rn = float(out.resnorm)          # sync
    dt = time.time() - t1
    h = np.asarray(out.history)[0]
    print(f"step {i}: {dt:6.2f}s |F|={rn:.3e} lam={h[1]:.3f} "
          f"ksp_its={int(h[2])} ksp_rel={h[3]:.2e}", flush=True)
    w = out.x
