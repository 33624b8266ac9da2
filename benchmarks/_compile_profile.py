"""Probe: where the cold XLA compile time goes (VERDICT round-3 item 4).

Times jaxpr trace and XLA compile separately for each sub-program of the
headline Newton step at a given mesh size, then the full step program:

    residual        (assembly only)
    jacobian        (matrix_values_layered — structured path)
    spmv            (layered_matvec)
    vcycle          (make_mg_pc apply, cheby6 + dense coarse)
    fgmres+jacobi   (krylov loop without MG)
    newton step     (the full headline program)

Run: python benchmarks/_compile_profile.py [lc]
NOTE: bypasses the persistent cache (unique dummy leaf per program) so
the numbers are true cold compiles.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

import jax
import jax.numpy as jnp
import numpy as np

from stabilized_navier_stokes_flow_fenicsx_tpu.config import DEFAULT
from stabilized_navier_stokes_flow_fenicsx_tpu.flow.channel import (
    _setup_layered, generate_channel_mesh)
from stabilized_navier_stokes_flow_fenicsx_tpu.flow.inlet import (
    solve_inlet_profiles)
from stabilized_navier_stokes_flow_fenicsx_tpu.forms.navier_stokes import (
    make_ns_sups_kernel)
from stabilized_navier_stokes_flow_fenicsx_tpu.assemble.layered import (
    layered_matvec, matrix_values_layered)
from stabilized_navier_stokes_flow_fenicsx_tpu.assemble.assembly import (
    AsmArrays, residual_of)
from stabilized_navier_stokes_flow_fenicsx_tpu.solve.mg import make_mg_pc
from stabilized_navier_stokes_flow_fenicsx_tpu.solve.krylov import fgmres
from stabilized_navier_stokes_flow_fenicsx_tpu.solve.precond import (
    block_jacobi)
from stabilized_navier_stokes_flow_fenicsx_tpu.solve.driver import (
    solve_newton_layered)
from stabilized_navier_stokes_flow_fenicsx_tpu.utils.testimg import (
    make_annulus_image)

lc = float(sys.argv[1]) if len(sys.argv) > 1 else 0.06
img = "/tmp/bench_circle.png"
if not os.path.exists(img):
    make_annulus_image(img, "circle")
inlet1, inlet2 = solve_inlet_profiles(img, 0.5, DEFAULT)
mesh, _, _ = generate_channel_mesh(img, lc, DEFAULT, layered=True)
W, lp, mask, g, g64, hier = _setup_layered(mesh, inlet1, inlet2, mg_levels=3)
arrays = lp.arrays
n2d, Lp, bs, E = lp.n2d, lp.n_planes, lp.bs, lp.E
ndofs = lp.ndofs
kern = make_ns_sups_kernel("tetrahedron", nu=0.1)
asm_a = AsmArrays(cell_dofs=arrays.cell_dofs, cell_coords=arrays.cell_coords,
                  indices=arrays.cols, row_ids=arrays.row_ids,
                  ell_pos=arrays.ell_pos, diag_pos=arrays.diag_pos)
print(f"ndofs={ndofs} cells={mesh.n_cells} E={E} Lp={Lp}", flush=True)


def prof(name, fn, *args):
    t0 = time.time()
    low = jax.jit(fn).lower(*args)
    tr = time.time() - t0
    t0 = time.time()
    comp = low.compile()
    co = time.time() - t0
    try:
        ma = comp.memory_analysis()
        extra = (f"  code {ma.generated_code_size_in_bytes / 1e6:8.1f} MB"
                 f"  temps {ma.temp_size_in_bytes / 1e6:8.1f} MB")
    except Exception:
        extra = ""
    print(f"{name:16s} trace {tr:7.2f}s  compile {co:7.2f}s{extra}",
          flush=True)


prof("residual", lambda w: residual_of(kern, ndofs, asm_a, w), g)
prof("jacobian", lambda w: matrix_values_layered(kern, E, Lp, bs, arrays, w),
     g)
V = matrix_values_layered(kern, E, Lp, bs, arrays, g)
prof("spmv", lambda v, x: layered_matvec(arrays, n2d, Lp, v, x), V, g)


def vc(v, r):
    M = make_mg_pc(hier, v, arrays.cols, arrays.row_ids, arrays.diag_pos,
                   mask, n2d, Lp, pc_dtype=jnp.bfloat16, smoother="cheby",
                   cheby_degree=6)
    return M(r)


prof("vcycle", vc, V, g)


def fg_jac(v, b):
    M = block_jacobi(v[arrays.diag_pos].transpose(3, 2, 0, 1)
                     .reshape(-1, bs, bs) if v.ndim == 5 else v, mask)

    def A(x):
        y = layered_matvec(arrays, n2d, Lp, v, mask * x)
        return mask * y + (1.0 - mask) * x

    return fgmres(A, b, M=M, rtol=1e-3, restart=50, max_restarts=4).x


prof("fgmres+jacobi", fg_jac, V, g)

t0 = time.time()
low = solve_newton_layered.lower(
    kern, n2d, Lp, bs, arrays, mask, g, g, E,
    0.0, 0.0, 1, 1e-3, 50, 4, "mg_cheby6_bf16", hier)
tr = time.time() - t0
t0 = time.time()
comp = low.compile()
co = time.time() - t0
ma = comp.memory_analysis()
print(f"{'newton step':16s} trace {tr:7.2f}s  compile {co:7.2f}s"
      f"  code {ma.generated_code_size_in_bytes / 1e6:8.1f} MB"
      f"  temps {ma.temp_size_in_bytes / 1e6:8.1f} MB", flush=True)
