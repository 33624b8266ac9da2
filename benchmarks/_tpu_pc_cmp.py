"""TPU wall-clock comparison of layered-operator PCs at bench scale.

Measures the bench.py headline shape (5 capped stepped-Newton dispatches
from the BC vector) and a converged-style stepped run from a Stokes init,
per PC.  Run from /root/repo (axon backend): python benchmarks/_tpu_pc_cmp.py [lc]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import numpy as np

import bench


def main():
    lc = float(sys.argv[1]) if len(sys.argv) > 1 else 0.035
    pcs = os.environ.get("PCS", "mg_jacobi_bf16,mg_line_bf16").split(",")
    from stabilized_navier_stokes_flow_fenicsx_tpu.forms.navier_stokes import (
        make_ns_sups_kernel)
    from stabilized_navier_stokes_flow_fenicsx_tpu.forms.stokes import (
        make_stokes_kernel)
    from stabilized_navier_stokes_flow_fenicsx_tpu.solve.driver import (
        solve_linear_layered, solve_newton_layered)

    t0 = time.time()
    mesh, W, lp, mask, g, hier = bench.build_problem(lc)
    print(f"lc={lc} ndofs={W.ndofs} cells={mesh.n_cells} "
          f"setup={time.time() - t0:.1f}s", flush=True)
    kern = make_ns_sups_kernel("tetrahedron", nu=1.0 / 10.0)

    def step(w, pc, ksp_rtol=1e-3, ksp_max_restarts=4, max_it=1, atol=0.0):
        return solve_newton_layered(
            kern, lp.n2d, lp.n_planes, lp.bs, lp.arrays, mask, g, w,
            lp.E, 0.0, atol, max_it, ksp_rtol, 50, ksp_max_restarts,
            pc, hier)

    for pc in pcs:
        # headline shape: 5 capped steps from the BC vector
        t0 = time.time()
        w, out = g, None
        for _ in range(5):
            out = step(w, pc)
            w = out.x
        rn = float(out.resnorm)
        first = time.time() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            w, out = g, None
            for _ in range(5):
                out = step(w, pc)
                w = out.x
            rn = float(out.resnorm)
            best = min(best, time.time() - t0)
        print(f"{pc:16s} headline5 first={first:.1f}s steady={best:.2f}s "
              f"|F|={rn:.3e}", flush=True)

    # converged-style: Stokes init + stepped Newton to 1e-6 relative
    stokes_k = make_stokes_kernel("tetrahedron", nu=1.0, mu_T_coeff=0.2)
    t0 = time.time()
    sres = solve_linear_layered(
        stokes_k, lp.n2d, lp.n_planes, lp.bs, lp.arrays, mask, g, lp.E,
        1e-6, 50, "mg_bf16", hier)
    ws = sres.x
    print(f"stokes mg_bf16: {time.time() - t0:.1f}s its={int(sres.iters)}",
          flush=True)
    for pc in pcs:
        r0 = float(step(ws, pc, max_it=0).resnorm)
        t0 = time.time()
        w, rn, its = ws, r0, 0
        while its < 15 and rn > 1e-6 * r0:
            out = step(w, pc, ksp_rtol=1e-4, ksp_max_restarts=8,
                       atol=1e-6 * r0)
            h = np.asarray(out.history)[0]
            new_rn = float(out.resnorm)
            print(f"  it {its}: |F|={new_rn:.3e} ksp={int(h[2])} "
                  f"lam={h[1]:.2f} t={time.time() - t0:.1f}s", flush=True)
            if bool(out.stalled) or new_rn >= rn:
                rn = min(rn, new_rn)
                break
            w, rn = out.x, new_rn
            its += 1
        print(f"{pc:16s} converged-run t={time.time() - t0:.1f}s its={its} "
              f"rel={rn / r0:.2e}", flush=True)


if __name__ == "__main__":
    main()
