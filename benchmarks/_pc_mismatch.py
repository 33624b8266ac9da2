"""Experiment: V-cycle PC built from a SIMPLER operator's values.

Hypothesis: the SUPS-tangent terms in the exact NS Jacobian poison the
aggregation V-cycle (NS its explode with h while Stokes stays flat).
Test: solve the TRUE NS-Jacobian system with PCs built from (a) the NS
Jacobian itself, (b) the Stokes operator values at the same state.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from stabilized_navier_stokes_flow_fenicsx_tpu.config import DEFAULT
from stabilized_navier_stokes_flow_fenicsx_tpu.flow.channel import (
    _setup_layered, generate_channel_mesh)
from stabilized_navier_stokes_flow_fenicsx_tpu.flow.inlet import (
    solve_inlet_profiles)
from stabilized_navier_stokes_flow_fenicsx_tpu.forms.navier_stokes import (
    make_ns_sups_kernel)
from stabilized_navier_stokes_flow_fenicsx_tpu.forms.stokes import (
    make_stokes_kernel)
from stabilized_navier_stokes_flow_fenicsx_tpu.assemble.layered import (
    layered_matvec, matrix_values_layered)
from stabilized_navier_stokes_flow_fenicsx_tpu.assemble.assembly import (
    residual_of, AsmArrays)
from stabilized_navier_stokes_flow_fenicsx_tpu.solve.krylov import fgmres
from stabilized_navier_stokes_flow_fenicsx_tpu.solve.mg import make_mg_pc
from stabilized_navier_stokes_flow_fenicsx_tpu.solve.driver import (
    solve_linear_layered)
from stabilized_navier_stokes_flow_fenicsx_tpu.utils.testimg import (
    make_annulus_image)

lc = float(sys.argv[1]) if len(sys.argv) > 1 else 0.06
img = "/tmp/linecr_circle.png"
if not os.path.exists(img):
    make_annulus_image(img, "circle")
inlet1, inlet2 = solve_inlet_profiles(img, 0.5, DEFAULT)
mesh, _, _ = generate_channel_mesh(img, lc, DEFAULT, layered=True)
W, lp, mask, g, g64, hier = _setup_layered(mesh, inlet1, inlet2, mg_levels=3)
print(f"lc={lc} ndofs={W.ndofs}", flush=True)
arrays, n2d, Lp, bs, E = lp.arrays, lp.n2d, lp.n_planes, lp.bs, lp.E
asm_arrays = AsmArrays(cell_dofs=arrays.cell_dofs,
                       cell_coords=arrays.cell_coords, indices=arrays.cols,
                       row_ids=arrays.row_ids, ell_pos=arrays.ell_pos,
                       diag_pos=arrays.diag_pos)
stokes_k = make_stokes_kernel("tetrahedron", nu=1.0, mu_T_coeff=0.2)
x_st = solve_linear_layered(stokes_k, n2d, Lp, bs, arrays, mask, g, E,
                            1e-8, 50, "mg_jacobi", hier).x
Re = float(os.environ.get("RE", "10"))
ns_k = make_ns_sups_kernel("tetrahedron", nu=1.0 / Re)
V_ns = matrix_values_layered(ns_k, E, Lp, bs, arrays, x_st)
# Stokes PC values at nu = 1/Re so magnitudes match the NS diffusion
stokes_nu = make_stokes_kernel("tetrahedron", nu=1.0 / Re, mu_T_coeff=0.2)
V_st = matrix_values_layered(stokes_nu, E, Lp, bs, arrays, x_st)
b = -residual_of(ns_k, W.ndofs, asm_arrays, x_st)
b_bc = mask * b
def A(x):
    y = layered_matvec(arrays, n2d, Lp, V_ns, mask * x)
    return mask * y + (1.0 - mask) * x
for nm, Vpc in (("pc=NSjac", V_ns), ("pc=Stokes", V_st)):
    for sm in ("jacobi", "zebra"):
        t0 = time.time()
        M = make_mg_pc(hier, Vpc, arrays.cols, arrays.row_ids,
                       arrays.diag_pos, mask, n2d, Lp, smoother=sm)
        res = fgmres(A, b_bc, M=M, rtol=1e-5, restart=50, max_restarts=40)
        print(f"{nm}/{sm:7s} iters={int(res.iters):5d} "
              f"conv={bool(res.converged)} t={time.time()-t0:.1f}s",
              flush=True)

# round-3 follow-up: ordered-plane smoothers with the dense coarse
for sm in ("plane_gs", "grouped"):
    t0 = time.time()
    M = make_mg_pc(hier, V_ns, arrays.cols, arrays.row_ids,
                   arrays.diag_pos, mask, n2d, Lp, smoother=sm)
    res = fgmres(A, b_bc, M=M, rtol=1e-5, restart=50, max_restarts=40)
    print(f"pc=NSjac/{sm:9s} iters={int(res.iters):5d} "
          f"conv={bool(res.converged)} t={time.time()-t0:.1f}s", flush=True)
