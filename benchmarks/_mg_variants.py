"""Probe: MG depth / cycle-type / dense-coarse-size variants (CPU x64).

Follow-up to the dense-coarse fix: at lc=0.06 the 3-level V-cycle with a
~1k dense coarsest still grows (217 Stokes / 185 NS its vs 31/31 at
lc=0.085) -- suspect the intermediate 0/1-prolongation levels.  Compare
shallower hierarchies (bigger exact coarse) and W-cycles.
Run: python benchmarks/_mg_variants.py [lc]
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
from stabilized_navier_stokes_flow_fenicsx_tpu.solve.mg import (
    build_mg_hierarchy, make_mg_pc)
from stabilized_navier_stokes_flow_fenicsx_tpu.utils.testimg import (
    make_annulus_image)

lc = float(sys.argv[1]) if len(sys.argv) > 1 else 0.06
img = "/tmp/linecr_circle.png"
if not os.path.exists(img):
    make_annulus_image(img, "circle")
inlet1, inlet2 = solve_inlet_profiles(img, 0.5, DEFAULT)
mesh, _, _ = generate_channel_mesh(img, lc, DEFAULT, layered=True)
W, lp, mask, g, g64, hier3 = _setup_layered(mesh, inlet1, inlet2, mg_levels=3)
rows = np.asarray(lp.pattern_like.row_ids)
cols = np.asarray(lp.pattern_like.indices)
def mk_h(nl):
    return build_mg_hierarchy(rows, cols, lp.n2d, lp.n_planes,
                              np.asarray(mask, np.float32), lp.bs,
                              n_levels=nl)
hier2, hier1 = mk_h(2), mk_h(1)
print(f"lc={lc} ndofs={W.ndofs} n2d={lp.n2d} Lp={lp.n_planes}", flush=True)
arrays = lp.arrays
n2d, Lp, bs, E = lp.n2d, lp.n_planes, lp.bs, lp.E
ndofs = W.ndofs
asm_arrays = AsmArrays(cell_dofs=arrays.cell_dofs,
                       cell_coords=arrays.cell_coords, indices=arrays.cols,
                       row_ids=arrays.row_ids, ell_pos=arrays.ell_pos,
                       diag_pos=arrays.diag_pos)

def solve(kernel, x_lin, rtol, variants):
    zero = jnp.zeros(ndofs, mask.dtype)
    values = matrix_values_layered(kernel, E, Lp, bs, arrays, x_lin)
    b = -residual_of(kernel, ndofs, asm_arrays, x_lin)
    def A(x):
        y = layered_matvec(arrays, n2d, Lp, values, mask * x)
        return mask * y + (1.0 - mask) * x
    b_bc = mask * b
    for name, (h, sm, ct, cap) in variants.items():
        t0 = time.time()
        M = make_mg_pc(h, values, arrays.cols, arrays.row_ids,
                       arrays.diag_pos, mask, n2d, Lp, smoother=sm,
                       cycle_type=ct, dense_cap=cap)
        res = fgmres(A, b_bc, M=M, rtol=rtol, restart=50, max_restarts=40)
        print(f"{name:24s} iters={int(res.iters):5d} "
              f"conv={bool(res.converged)} t={time.time()-t0:.1f}s",
              flush=True)

VAR = {
    "jac_3lv_V": (hier3, "jacobi", "v", 8192),
    "jac_2lv_V": (hier2, "jacobi", "v", 16384),
    "jac_1lv_V": (hier1, "jacobi", "v", 40000),
    "jac_3lv_W": (hier3, "jacobi", "w", 8192),
    "zeb_3lv_W": (hier3, "zebra", "w", 8192),
    "zeb_2lv_V": (hier2, "zebra", "v", 16384),
}
stokes_k = make_stokes_kernel("tetrahedron", nu=1.0, mu_T_coeff=0.2)
print("--- Stokes rtol 1e-8 ---", flush=True)
zero = jnp.zeros(ndofs, mask.dtype)
solve(stokes_k, zero, 1e-8, VAR)
# NS Jacobian at the Stokes solution
from stabilized_navier_stokes_flow_fenicsx_tpu.solve.driver import (
    solve_linear_layered)
x_st = solve_linear_layered(stokes_k, n2d, Lp, bs, arrays, mask, g, E,
                            1e-8, 50, "mg_zebra", hier3).x
Re = float(os.environ.get("RE", "10"))
ns_k = make_ns_sups_kernel("tetrahedron", nu=1.0 / Re)
print(f"--- NS Jacobian Re={Re} at Stokes init, rtol 1e-5 ---", flush=True)
solve(ns_k, x_st, 1e-5, VAR)
