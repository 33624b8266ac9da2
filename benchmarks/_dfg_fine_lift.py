"""Fine-scale DFG 2D lift probe (CPU f64 host-LU).

Round-3 attribution: Cl error is global-resolution-limited (-20.8% at
scale 0.25, monotone from below).  This sweep pushes the global scale
toward the reference's fine gmsh config to locate the scale where Cl
enters a ±15% band.
"""
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from stabilized_navier_stokes_flow_fenicsx_tpu.apps.dfg2d import solve_dfg2d

for scale in [float(a) for a in (sys.argv[1:] or ["0.2", "0.16"])]:
    t0 = time.time()
    r = solve_dfg2d(scale, cyl_factor=0.5)
    print(f'scale={scale} cf=0.5 nodes={r.mesh.n_nodes} cd={r.cd:.4f} '
          f'({r.cd_err_pct:+.2f}%) cl={r.cl:.6f} ({r.cl_err_pct:+.1f}%) '
          f'surf_cl={r.cl_surface:.6f} t={time.time()-t0:.0f}s',
          flush=True)
