"""Square-duct Stokes flow — the reference's known-output smoke test.

Reimplements reference StokesFlow/DuctStokesFlow.py natively: a square duct
x in [0, L], cross-section (-0.5, 0.5)^2, inlet velocity Dirichlet, no-slip
walls, outlet pressure 0 (reference :156-183).  The reference meshes with
gmsh and solves unstabilized Taylor-Hood by MUMPS LU; here the duct is a
native structured tet mesh (no mesher dependency) solved with the
stabilized P1-P1 form + FGMRES — the path the channel solver uses, so this
doubles as its validation: for exact-profile inflow the solution must stay
fully-developed (README.md:44-56).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..assemble.assembly import assembler_for_mixed
from ..assemble.df_assembly import DFResidual
from ..config import SolverConfig
from ..fem.bc import DirichletBC, bc_mask, bc_vector, combine_bcs
from ..fem.space import make_mixed_space
from ..forms.stokes import make_stokes_kernel
from ..forms.stokes_df import make_stokes_kernel_df
from ..forms.navier_stokes_df import split64
from ..mesh.structured import duct_mesh
from ..solve.driver import refine_newton_bcsr, solve_linear_bcsr
from ..utils.exact import square_duct_profile, square_duct_mean


@dataclasses.dataclass
class DuctResult:
    mesh: object
    space: object
    u: np.ndarray
    p: np.ndarray
    ksp_iters: int
    converged: bool
    refined: bool = False
    refine_resnorm: float = float("nan")

    def flux(self, marker: int) -> float:
        """Integral of u_x over the facets with the given marker."""
        f = self.mesh.facets[self.mesh.facet_markers == marker]
        tp = self.mesh.points[f]
        ar = np.linalg.norm(
            np.cross(tp[:, 1] - tp[:, 0], tp[:, 2] - tp[:, 0]) / 2, axis=1)
        return float((self.u[f, 0].mean(axis=1) * ar).sum())


def solve_duct(
    n_cross: int = 8,
    n_axial: int = 16,
    length: float = 2.0,
    inlet: str = "poiseuille",
    solver: Optional[SolverConfig] = None,
) -> DuctResult:
    """inlet: 'poiseuille' (exact developed profile, mean normalized to 1)
    or 'uniform' (u_x = 1, the reference's BC, DuctStokesFlow.py:171-181)."""
    cfg = solver or SolverConfig()
    mesh = duct_mesh(n_cross, n_axial, length)
    W = make_mixed_space(mesh, 1, 1)
    asm = assembler_for_mixed(W)

    wall = mesh.nodes_with_marker(4)
    inlet_nodes = mesh.nodes_with_marker(1)
    outlet_nodes = mesh.nodes_with_marker(3)

    def vdofs(nodes):
        return np.stack(
            [W.velocity_dof(nodes, c) for c in range(3)], -1).ravel()

    iv = np.zeros((len(inlet_nodes), 3))
    if inlet == "uniform":
        iv[:, 0] = 1.0
    else:
        yz = mesh.points[inlet_nodes][:, 1:3]
        iv[:, 0] = square_duct_profile(yz[:, 0], yz[:, 1]) / square_duct_mean()

    bc = combine_bcs([
        DirichletBC(vdofs(wall), np.zeros(3 * len(wall))),
        DirichletBC(vdofs(inlet_nodes), iv.ravel()),
        DirichletBC(W.pressure_dof(outlet_nodes), np.zeros(len(outlet_nodes))),
    ])
    g64 = bc_vector(W.ndofs, bc)
    mask = jnp.asarray(bc_mask(W.ndofs, bc), asm.dtype)
    g = jnp.asarray(g64, asm.dtype)
    pat = asm.pattern

    kern = make_stokes_kernel("tetrahedron", nu=1.0, mu_T_coeff=0.2)
    refine_on = cfg.refine == "on" or (
        cfg.refine == "auto" and mask.dtype == jnp.float32)
    # on f32, a 1e-10 Krylov tolerance is unreachable — solve loosely and
    # let double-float iterative refinement carry the residual the rest of
    # the way (solve/refine.py; matches the reference's f64 bcgs 1e-10,
    # StokesFlow/StokesChannelFlow.py:166)
    base_rtol = 1e-6 if refine_on else 1e-10
    res = solve_linear_bcsr(
        kern, asm.ndofs, pat.nnzb, pat.bs, pat.n_rows,
        base_rtol, cfg.ksp_restart, asm.arrays, mask, g)

    if refine_on:
        kdf = make_stokes_kernel_df("tetrahedron", nu=1.0, mu_T_coeff=0.2)
        dfr = DFResidual(W, kdf)
        g_df = split64(g64)
        zero = jnp.zeros(asm.ndofs, asm.dtype)
        n0 = jnp.linalg.norm(
            mask * asm.residual(kern, zero) + (1.0 - mask) * (zero - g))
        rres = refine_newton_bcsr(
            kern, kdf, asm.ndofs, pat.nnzb, pat.bs, pat.n_rows,
            asm.arrays, dfr.dfa, mask, g_df.hi, g_df.lo, res.x, n0,
            1e-10, 0.0, cfg.refine_max_it, cfg.refine_ksp_rtol,
            cfg.ksp_restart, cfg.refine_ksp_max_restarts)
        w = np.asarray(rres.x_hi, np.float64) + np.asarray(rres.x_lo)
        u, p = W.split(w)
        return DuctResult(mesh, W, np.asarray(u), np.asarray(p),
                          int(res.iters), bool(rres.converged),
                          refined=True,
                          refine_resnorm=float(rres.resnorm))

    u, p = W.split(np.asarray(res.x))
    return DuctResult(mesh, W, np.asarray(u), np.asarray(p),
                      int(res.iters), bool(res.converged))


def main(argv=None):
    import sys

    argv = sys.argv[1:] if argv is None else argv
    n = int(argv[0]) if argv else 8
    r = solve_duct(n, 2 * n)
    print(f"KSP iters: {r.ksp_iters}, converged: {r.converged}")
    print(f"inlet flux {r.flux(1):.6f}  outlet flux {r.flux(3):.6f}")
    pts = r.mesh.points
    uex = square_duct_profile(pts[:, 1], pts[:, 2]) / square_duct_mean()
    err = np.sqrt(np.mean((r.u[:, 0] - uex) ** 2)) / np.sqrt(np.mean(uex**2))
    print(f"relative L2 error vs developed profile: {err:.4f}")
    return r


if __name__ == "__main__":
    main()
