"""DFG2D lift variant probe at scale=0.5 (annulus knobs)."""
import time
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from stabilized_navier_stokes_flow_fenicsx_tpu.apps.dfg2d import solve_dfg2d

VARIANTS = [
    dict(band_layers=7),
    dict(band_layers=7, band_first=0.2, band_ratio=1.3),
]
for kw in VARIANTS:
    t0 = time.time()
    r = solve_dfg2d(0.5, cyl_factor=0.5, **kw)
    print(f'{kw} nodes={r.mesh.n_nodes} cd={r.cd:.4f} ({r.cd_err_pct:+.2f}%) '
          f'cl={r.cl:.6f} ({r.cl_err_pct:+.1f}%) t={time.time()-t0:.0f}s',
          flush=True)
t0 = time.time()
r = solve_dfg2d(0.5, cyl_factor=0.25)
print(f'cf=0.25 nodes={r.mesh.n_nodes} cd={r.cd:.4f} ({r.cd_err_pct:+.2f}%) '
      f'cl={r.cl:.6f} ({r.cl_err_pct:+.1f}%) t={time.time()-t0:.0f}s',
      flush=True)
