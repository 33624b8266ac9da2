import time
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from stabilized_navier_stokes_flow_fenicsx_tpu.apps.dfg2d import solve_dfg2d
for scale, cf in ((1.0, 0.5), (0.5, 0.5), (0.35, 0.5)):
    t0 = time.time()
    r = solve_dfg2d(scale, cyl_factor=cf)
    print(f'scale={scale} cf={cf} nodes={r.mesh.n_nodes} '
          f'cd={r.cd:.4f} ({r.cd_err_pct:+.2f}%) '
          f'cl={r.cl:.6f} ({r.cl_err_pct:+.1f}%) '
          f'cl_surf={r.cl_surface:.6f} t={time.time()-t0:.0f}s', flush=True)
