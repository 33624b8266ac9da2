import time
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from stabilized_navier_stokes_flow_fenicsx_tpu.apps.dfg2d import solve_dfg2d
t0 = time.time()
r = solve_dfg2d(0.25, cyl_factor=0.5)
print(f'scale=0.25 cf=0.5 nodes={r.mesh.n_nodes} cd={r.cd:.4f} '
      f'({r.cd_err_pct:+.2f}%) cl={r.cl:.6f} ({r.cl_err_pct:+.1f}%) '
      f't={time.time()-t0:.0f}s', flush=True)
