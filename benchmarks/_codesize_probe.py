"""Probe 2: which construct makes the TPU backend emit 100+ MB of code.

Compiles variants of the V-cycle and Jacobian assembly and prints
generated_code_size — the executable-size axis behind the ~190 s
first-dispatch program upload on the tunneled TPU (round-4 measurement:
newton step = 273 MB code at 70k dofs; StableHLO is only 5.4k lines, so
the expansion happens in the XLA:TPU backend).

Run: python benchmarks/_codesize_probe.py [lc]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

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
    matrix_values_layered)
from stabilized_navier_stokes_flow_fenicsx_tpu.assemble.assembly import (
    AsmArrays, residual_of)
from stabilized_navier_stokes_flow_fenicsx_tpu.solve.mg import make_mg_pc
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
print(f"ndofs={ndofs} cells={mesh.n_cells} E={E} Lp={Lp}", flush=True)
V = None


def prof(name, fn, *args):
    t0 = time.time()
    comp = jax.jit(fn).lower(*args).compile()
    dt = time.time() - t0
    ma = comp.memory_analysis()
    print(f"{name:28s} {dt:7.1f}s  code "
          f"{ma.generated_code_size_in_bytes / 1e6:8.1f} MB  temps "
          f"{ma.temp_size_in_bytes / 1e6:8.1f} MB", flush=True)
    return comp


V = matrix_values_layered(kern, E, Lp, bs, arrays, g)


def vc(smoother, degree, dense, nlev):
    h = hier if nlev is None else type(hier)(
        levels=hier.levels[:nlev], dims=hier.dims[:nlev])

    def f(v, r):
        M = make_mg_pc(h, v, arrays.cols, arrays.row_ids, arrays.diag_pos,
                       mask, n2d, Lp, pc_dtype=jnp.bfloat16,
                       smoother=smoother, cheby_degree=degree,
                       coarse=("dense" if dense else "sweeps"))
        return M(r)

    return f


prof("vcycle cheby6 dense L3", vc("cheby", 6, True, None), V, g)
prof("vcycle cheby6 sweeps L3", vc("cheby", 6, False, None), V, g)
prof("vcycle cheby1 dense L3", vc("cheby", 1, True, None), V, g)
prof("vcycle cheby6 dense L1", vc("cheby", 6, True, 1), V, g)
prof("vcycle jacobi dense L3", vc("jacobi", 6, True, None), V, g)

asm_a = AsmArrays(cell_dofs=arrays.cell_dofs, cell_coords=arrays.cell_coords,
                  indices=arrays.cols, row_ids=arrays.row_ids,
                  ell_pos=arrays.ell_pos, diag_pos=arrays.diag_pos)
prof("residual", lambda w: residual_of(kern, ndofs, asm_a, w), g)
prof("jacobian structured",
     lambda w: matrix_values_layered(kern, E, Lp, bs, arrays, w), g)
plain = arrays._replace(sasm=None)
prof("jacobian scatter",
     lambda w: matrix_values_layered(kern, E, Lp, bs, plain, w), g)
