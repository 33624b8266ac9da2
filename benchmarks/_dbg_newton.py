"""Diagnose Newton convergence from a Stokes init on TPU: per-step
(|F|, lambda, ksp iters) via NewtonResult.history."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np, jax
from stabilized_navier_stokes_flow_fenicsx_tpu.utils.testimg import make_annulus_image
from stabilized_navier_stokes_flow_fenicsx_tpu.flow.channel import generate_channel_mesh, _setup_layered
from stabilized_navier_stokes_flow_fenicsx_tpu.flow.inlet import solve_inlet_profiles
from stabilized_navier_stokes_flow_fenicsx_tpu.config import DEFAULT
from stabilized_navier_stokes_flow_fenicsx_tpu.forms.navier_stokes import make_ns_sups_kernel
from stabilized_navier_stokes_flow_fenicsx_tpu.forms.stokes import make_stokes_kernel
from stabilized_navier_stokes_flow_fenicsx_tpu.solve.driver import solve_newton_layered_stepped, solve_linear_layered

lc = float(sys.argv[1]) if len(sys.argv) > 1 else 0.05
pc = sys.argv[2] if len(sys.argv) > 2 else "mg_bf16"
img = "/tmp/bench_circle.png"
if not os.path.exists(img): make_annulus_image(img, "circle")
inlet1, inlet2 = solve_inlet_profiles(img, 0.5, DEFAULT)
mesh, _, _ = generate_channel_mesh(img, lc, DEFAULT, layered=True)
W, lp, mask, g, _g, hier = _setup_layered(mesh, inlet1, inlet2, mg_levels=3)
print(f"ndofs={W.ndofs}", flush=True)
stokes_k = make_stokes_kernel("tetrahedron", nu=1.0, mu_T_coeff=0.2)
sres = solve_linear_layered(stokes_k, lp.n2d, lp.n_planes, lp.bs,
    lp.arrays, mask, g, lp.E, 1e-6, 50, "mg_bf16", hier)
print(f"stokes: iters={int(sres.iters)} conv={bool(sres.converged)} res={float(sres.resnorm):.3e}", flush=True)
kern = make_ns_sups_kernel("tetrahedron", nu=0.1)
t0 = time.time()
ksp_rtol = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-5
out = solve_newton_layered_stepped(kern, lp.n2d, lp.n_planes, lp.bs, lp.arrays,
    mask, g, sres.x, lp.E, 1e-8, 1e-8, 12, ksp_rtol, 50, 8, pc, hier)
rn = float(out.resnorm)
h = np.asarray(out.history)
print(f"newton({pc}): its={int(out.iters)} res={rn:.3e} conv={bool(out.converged)} t={time.time()-t0:.1f}s", flush=True)
for i, row in enumerate(h):
    if row[0] < 0: break
    print(f"  step {i}: |F|={row[0]:.3e} lambda={row[1]:.3f} ksp={row[2]:.0f} extra={row[3]:.3e}", flush=True)
