"""DFG3D Cd sweep with the symmetric annulus cross-section band."""
import time
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from stabilized_navier_stokes_flow_fenicsx_tpu.apps.dfg3d import solve_dfg3d
for scale, cf in ((2.0, 1.0), (1.5, 1.0), (1.5, 0.6), (1.2, 0.6)):
    t0 = time.time()
    r = solve_dfg3d(scale, cyl_factor=cf)
    print(f'scale={scale} cf={cf} nodes={r.mesh.n_nodes} '
          f'cd={r.cd:.4f} ({100*(r.cd-6.18)/6.18:+.2f}%) cl={r.cl:.5f} '
          f'cd_surf={r.cd_surface:.4f} t={time.time()-t0:.0f}s', flush=True)
