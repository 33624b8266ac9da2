"""Wake-only refinement probe for the DFG 2D lift (CPU f64 host-LU).

Round-3 attribution: Cl error is global-resolution-limited.  This probes
whether refining just the wake/far sizefield (wake_factor) buys the same
Cl accuracy as uniform scale reduction at fewer dofs.
"""
import itertools
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from stabilized_navier_stokes_flow_fenicsx_tpu.apps.dfg2d import solve_dfg2d

cases = [(0.25, 0.7), (0.25, 0.5), (0.2, 0.7)]
if len(sys.argv) > 1:
    vals = [float(a) for a in sys.argv[1:]]
    cases = list(zip(vals[0::2], vals[1::2]))

for scale, wf in cases:
    t0 = time.time()
    r = solve_dfg2d(scale, cyl_factor=0.5, wake_factor=wf)
    print(f'scale={scale} wf={wf} nodes={r.mesh.n_nodes} cd={r.cd:.4f} '
          f'({r.cd_err_pct:+.2f}%) cl={r.cl:.6f} ({r.cl_err_pct:+.1f}%) '
          f't={time.time()-t0:.0f}s', flush=True)
