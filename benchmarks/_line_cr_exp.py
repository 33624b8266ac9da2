"""Experiment: cyclic-reduction line solve as PC / MG smoother.

CPU (x64) measurement of (a) line_cr == blocked-Thomas correctness,
(b) FGMRES iteration counts on the channel Stokes system and on the
advective NS Jacobian (one Newton step from the Stokes init) across
preconditioners.  Informs the round-3 default PC choice.
Run: JAX_PLATFORMS=cpu python benchmarks/_line_cr_exp.py [lc]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

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
    matrix_values_layered)
from stabilized_navier_stokes_flow_fenicsx_tpu.solve.driver import (
    solve_linear_layered, solve_newton_layered)
from stabilized_navier_stokes_flow_fenicsx_tpu.solve.precond import (
    line_cr_layered, line_jacobi_layered)
from stabilized_navier_stokes_flow_fenicsx_tpu.utils.testimg import (
    make_annulus_image)


def main():
    lc = float(sys.argv[1]) if len(sys.argv) > 1 else 0.12
    img = "/tmp/linecr_circle.png"
    if not os.path.exists(img):
        make_annulus_image(img, "circle")
    inlet1, inlet2 = solve_inlet_profiles(img, 0.5, DEFAULT)
    mesh, _, _ = generate_channel_mesh(img, lc, DEFAULT, layered=True)
    W, lp, mask, g, g64, hier = _setup_layered(mesh, inlet1, inlet2,
                                               mg_levels=3)
    from stabilized_navier_stokes_flow_fenicsx_tpu.fem.bc import (  # noqa
        bc_mask)
    from stabilized_navier_stokes_flow_fenicsx_tpu.solve.mg import (
        build_mg_hierarchy)

    hier_semi = build_mg_hierarchy(
        np.asarray(lp.pattern_like.row_ids),
        np.asarray(lp.pattern_like.indices),
        lp.n2d, lp.n_planes, np.asarray(mask, np.float32), lp.bs,
        n_levels=3, coarsen_planes=False)

    def pick(pc):
        if pc.endswith("_semi"):
            return pc[:-5], hier_semi
        return pc, hier
    print(f"lc={lc} ndofs={W.ndofs} n2d={lp.n2d} Lp={lp.n_planes}")

    stokes_k = make_stokes_kernel("tetrahedron", nu=1.0, mu_T_coeff=0.2)

    # (a) correctness: line_cr vs blocked Thomas on the Stokes values
    V = matrix_values_layered(stokes_k, lp.E, lp.n_planes, lp.bs,
                              lp.arrays, jnp.zeros(W.ndofs))
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal(W.ndofs))
    x_cr = line_cr_layered(V, lp.arrays.diag_pos, mask, lp.n2d,
                           lp.n_planes)(r)
    x_th = line_jacobi_layered(V, lp.arrays.diag_pos, mask, lp.n2d,
                               lp.n_planes)(r)
    rel = float(jnp.linalg.norm(x_cr - x_th) / jnp.linalg.norm(x_th))
    print(f"line_cr vs Thomas rel diff: {rel:.3e}")

    # (b) Stokes linear solve iteration counts
    pcs = os.environ.get(
        "PCS", "plane_gs,line_cr,mg,mg_jacobi,mg_grouped,mg_line"
    ).split(",")
    print("--- Stokes, rtol 1e-8 ---")
    for pc in pcs:
        pcn, h = pick(pc)
        t0 = time.time()
        res = solve_linear_layered(
            stokes_k, lp.n2d, lp.n_planes, lp.bs, lp.arrays, mask, g,
            lp.E, 1e-8, 50, pcn, h)
        it = int(res.iters)
        print(f"{pc:12s} iters={it:5d} conv={bool(res.converged)} "
              f"t={time.time() - t0:.1f}s")
    x_stokes = solve_linear_layered(
        stokes_k, lp.n2d, lp.n_planes, lp.bs, lp.arrays, mask, g,
        lp.E, 1e-8, 50, "mg", hier).x

    # (c) one NS Newton step from the Stokes init at Re=50
    Re = float(os.environ.get("RE", "50"))
    ns_k = make_ns_sups_kernel("tetrahedron", nu=1.0 / Re)
    print(f"--- NS Jacobian Re={Re} (1 Newton step from Stokes init), "
          "ksp_rtol 1e-5 ---")
    for pc in pcs:
        pcn, h = pick(pc)
        t0 = time.time()
        out = solve_newton_layered(
            ns_k, lp.n2d, lp.n_planes, lp.bs, lp.arrays, mask, g,
            x_stokes, lp.E, 0.0, 0.0, 1, 1e-5, 50, 40, pcn, h)
        h = np.asarray(out.history)[0]
        print(f"{pc:12s} ksp_iters={int(h[2]):5d} ksp_rn={h[3]:.2e} "
              f"|F|={float(out.resnorm):.3e} t={time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
