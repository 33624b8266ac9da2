"""Probe: XLA cost-model table for the hot-path stages (CPU lowering).

At lc=0.06 (70k dofs, 90k cells, nnzb 349k), per call:
  residual             1.6e8  flops   0.59 GB
  jacobian assembly    1.2e9  flops   3.4  GB   (bandwidth-bound)
  layered SpMV         1.1e7  flops   0.032 GB  (bandwidth-bound)
  V-cycle build+apply  3.7e10 flops   0.90 GB   (cheby smoother)

The V-cycle's flops are ~all the dense-coarse factorization (inverse +
two Newton-Schulz polish matmuls, ~8*N^3 at the ~1.7k-dof coarsest
level) — pure MXU work that costs milliseconds on TPU while the
bandwidth-bound stages set the real pace.  Scaling to the 1.05M bench:
jacobian ~50 GB/assembly (~60 ms at v5e HBM), SpMV ~5 ms, dense coarse
<= 8192 dofs by dense_cap.
Run: python benchmarks/_cost_model.py [lc]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from stabilized_navier_stokes_flow_fenicsx_tpu.config import DEFAULT
from stabilized_navier_stokes_flow_fenicsx_tpu.flow.channel import (_setup_layered, generate_channel_mesh)
from stabilized_navier_stokes_flow_fenicsx_tpu.flow.inlet import solve_inlet_profiles
from stabilized_navier_stokes_flow_fenicsx_tpu.forms.navier_stokes import make_ns_sups_kernel
from stabilized_navier_stokes_flow_fenicsx_tpu.assemble.layered import layered_matvec, matrix_values_layered
from stabilized_navier_stokes_flow_fenicsx_tpu.assemble.assembly import residual_of, AsmArrays
from stabilized_navier_stokes_flow_fenicsx_tpu.solve.mg import make_mg_pc
from stabilized_navier_stokes_flow_fenicsx_tpu.utils.testimg import make_annulus_image

lc = float(sys.argv[1]) if len(sys.argv) > 1 else 0.06
img = "/tmp/linecr_circle.png"
if not os.path.exists(img):
    make_annulus_image(img, "circle")
inlet1, inlet2 = solve_inlet_profiles(img, 0.5, DEFAULT)
mesh, _, _ = generate_channel_mesh(img, lc, DEFAULT, layered=True)
W, lp, mask, g, g64, hier = _setup_layered(mesh, inlet1, inlet2, mg_levels=3)
arrays = lp.arrays
n2d, Lp, bs, E = lp.n2d, lp.n_planes, lp.bs, lp.E
kern = make_ns_sups_kernel("tetrahedron", nu=0.1)
asm_arrays = AsmArrays(cell_dofs=arrays.cell_dofs, cell_coords=arrays.cell_coords,
                       indices=arrays.cols, row_ids=arrays.row_ids,
                       ell_pos=arrays.ell_pos, diag_pos=arrays.diag_pos)
w0 = jnp.zeros(lp.ndofs)

def cost(f, *a):
    c = jax.jit(f).lower(*a).compile().cost_analysis()
    if isinstance(c, (list, tuple)): c = c[0]
    return c.get("flops", 0.0), c.get("bytes accessed", c.get("bytes accessed0{}", 0.0))

fl_r, by_r = cost(lambda w: residual_of(kern, lp.ndofs, asm_arrays, w), w0)
fl_j, by_j = cost(lambda w: matrix_values_layered(kern, E, Lp, bs, arrays, w), w0)
V = matrix_values_layered(kern, E, Lp, bs, arrays, w0)
fl_mv, by_mv = cost(lambda v, x: layered_matvec(arrays, n2d, Lp, v, x), V, w0)
def vc(v, r):
    M = make_mg_pc(hier, v, arrays.cols, arrays.row_ids, arrays.diag_pos,
                   mask, n2d, Lp, smoother="cheby")
    return M(r)
fl_vc, by_vc = cost(vc, V, w0)
print(f"ndofs={lp.ndofs} nnzb={lp.nnzb} cells={mesh.n_cells}")
print(f"residual : {fl_r:.3e} flops  {by_r:.3e} B")
print(f"jacobian : {fl_j:.3e} flops  {by_j:.3e} B")
print(f"spmv     : {fl_mv:.3e} flops  {by_mv:.3e} B")
print(f"vcycle+build(cheby): {fl_vc:.3e} flops  {by_vc:.3e} B")
