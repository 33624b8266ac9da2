"""Probe: Chebyshev-Jacobi smoother degree/interval sweep (CPU x64).

Measured on the NS Jacobian at the Stokes init (channel, Re=10),
FGMRES(50) to rtol 1e-5, 3-level V-cycle with dense exact coarse:

  lc=0.06 (70k dofs):   q3_a4  92 | q4_a4  18 | q3_a2 28 | q3/q5_a8 DIVERGE
  lc=0.045 (166k):      q3_a4 223 | q4_a4  25 | q4_a3 26 | q5_a4 28 | q3_a2 45
  lc=0.035 (345k):                  q4_a4  35 | q3_a2 76

Reynolds robustness (lc=0.06, Jacobian at the COLD Stokes init):
  Re=40: q4_a4 43 its | q3_a2 101
  Re=70: both fail (2000 its) — at a state that far from the Re=70
  solution the Jacobian is advection-dominated end to end; the
  production continuation never solves there (it ladders Re>=50 from
  warm starts), and the Newton production default stays plane_gs.

Conclusions: degree 4 + alpha 4 is near mesh-independent and robust at
the bench regime; alpha=8 reaches too far down the nonsymmetric
spectrum and diverges.  Defaults in solve/mg.py (cheby_degree=4,
cheby_alpha=4).  Run: python benchmarks/_cheby_sweep.py [lc]
  (RE=<n> env overrides the Reynolds number.)
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from stabilized_navier_stokes_flow_fenicsx_tpu.config import DEFAULT
from stabilized_navier_stokes_flow_fenicsx_tpu.flow.channel import (_setup_layered, generate_channel_mesh)
from stabilized_navier_stokes_flow_fenicsx_tpu.flow.inlet import solve_inlet_profiles
from stabilized_navier_stokes_flow_fenicsx_tpu.forms.navier_stokes import make_ns_sups_kernel
from stabilized_navier_stokes_flow_fenicsx_tpu.forms.stokes import make_stokes_kernel
from stabilized_navier_stokes_flow_fenicsx_tpu.assemble.layered import layered_matvec, matrix_values_layered
from stabilized_navier_stokes_flow_fenicsx_tpu.assemble.assembly import residual_of, AsmArrays
from stabilized_navier_stokes_flow_fenicsx_tpu.solve.krylov import fgmres
from stabilized_navier_stokes_flow_fenicsx_tpu.solve.mg import make_mg_pc
from stabilized_navier_stokes_flow_fenicsx_tpu.solve.driver import solve_linear_layered
from stabilized_navier_stokes_flow_fenicsx_tpu.utils.testimg import make_annulus_image

lc = float(sys.argv[1]) if len(sys.argv) > 1 else 0.06
img = "/tmp/linecr_circle.png"
if not os.path.exists(img):
    make_annulus_image(img, "circle")
inlet1, inlet2 = solve_inlet_profiles(img, 0.5, DEFAULT)
mesh, _, _ = generate_channel_mesh(img, lc, DEFAULT, layered=True)
W, lp, mask, g, g64, hier3 = _setup_layered(mesh, inlet1, inlet2, mg_levels=3)
print(f"lc={lc} ndofs={W.ndofs}", flush=True)
arrays = lp.arrays
n2d, Lp, bs, E = lp.n2d, lp.n_planes, lp.bs, lp.E
ndofs = W.ndofs
asm_arrays = AsmArrays(cell_dofs=arrays.cell_dofs, cell_coords=arrays.cell_coords,
                       indices=arrays.cols, row_ids=arrays.row_ids,
                       ell_pos=arrays.ell_pos, diag_pos=arrays.diag_pos)
stokes_k = make_stokes_kernel("tetrahedron", nu=1.0, mu_T_coeff=0.2)
x_st = solve_linear_layered(stokes_k, n2d, Lp, bs, arrays, mask, g, E, 1e-8, 50, "mg_zebra", hier3).x
ns_k = make_ns_sups_kernel("tetrahedron", nu=1.0/10.0)
values = matrix_values_layered(ns_k, E, Lp, bs, arrays, x_st)
b = -residual_of(ns_k, ndofs, asm_arrays, x_st)
def A(x):
    y = layered_matvec(arrays, n2d, Lp, values, mask * x)
    return mask * y + (1.0 - mask) * x
b_bc = mask * b
for tag, kw in [
    ("q4_a4_V", dict(cheby_degree=4, cheby_alpha=4.0)),
    ("q3_a2_V", dict(cheby_degree=3, cheby_alpha=2.0)),
]:
    t0 = time.time()
    M = make_mg_pc(hier3, values, arrays.cols, arrays.row_ids, arrays.diag_pos,
                   mask, n2d, Lp, smoother="cheby", **kw)
    res = fgmres(A, b_bc, M=M, rtol=1e-5, restart=50, max_restarts=40)
    print(f"{tag:10s} iters={int(res.iters):5d} conv={bool(res.converged)} t={time.time()-t0:.1f}s", flush=True)
