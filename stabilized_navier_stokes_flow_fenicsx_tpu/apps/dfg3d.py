"""DFG 3D pillar benchmark (3D-1Z, Re=20).

Replicates reference NavierStokes/Validation_Flow/DFG_3D_Validation.py:
channel [0,2.2]x[0,0.41]x[0,0.41] with a circular pillar (c=(0.5,0.2),
r=0.05) extruded through the span (dfg_pillar_3D.geo:33-36,96);
bi-parabolic inlet u_x = 0.45 * 16 y z (0.41-y)(0.41-z)/0.41^4 (:103-106);
Stokes init -> G-metric SUPS Navier-Stokes at nu = 1e-3 (:193);
drag/lift from the traction integral sigma.(-n) over the pillar with
C = 2F/(rho Uc^2 Lc), Uc = 0.2, Lc = 0.041 (:344-367).

Markers: 2 = inlet, 3 = outlet, 4 = walls (incl. z-planes), 5 = obstacle.
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..assemble.assembly import assembler_for_mixed
from ..config import SolverConfig
from ..fem.bc import DirichletBC, bc_mask, bc_vector, combine_bcs
from ..fem.space import make_mixed_space
from ..flow.forces import traction_force_3d
from ..forms.navier_stokes import make_ns_sups_kernel
from ..forms.stokes import make_stokes_kernel
from ..mesh.core import SimplexMesh, mark_boundary_facets
from ..mesh.extrude import extrude_tri_mesh
from ..mesh.sizefield import (
    merge_meshes, structured_annulus, triangulate_sizefield)
from ..solve.newton_host import linear_host_lu, newton_host_lu

L, W = 2.2, 0.41
CX, CY, R = 0.5, 0.2, 0.05
NU = 1e-3
UC, LC_REF = 0.2, 0.1 * 0.41


def dfg3d_mesh(scale: float = 1.0, cyl_factor: float = 1.0,
               symmetric_band: bool = True,
               near_growth: float = 0.3) -> SimplexMesh:
    """cyl_factor < 1 refines the pillar neighbourhood only (the drag
    error is dominated by the surface/boundary-layer resolution);
    symmetric_band glues a structured annulus into the cross-section
    (see dfg2d / mesh/sizefield.py) before extruding through the span;
    near_growth sets the in-plane size growth off the pillar (the 2D
    lift-accuracy axis, apps/dfg2d.py — the 3D default stays 0.3
    because every in-plane cell is extruded through the whole span)."""
    lc_far = 0.09 * scale
    lc_wake = 0.035 * scale
    lc_cyl = 0.014 * scale * cyl_factor

    def lc_fn(p):
        p = np.atleast_2d(p)
        d = np.hypot(p[:, 0] - CX, p[:, 1] - CY) - R
        near = lc_cyl + near_growth * np.maximum(d, 0.0)
        wake = np.where(
            (p[:, 0] > CX) & (p[:, 0] < 1.4) & (np.abs(p[:, 1] - CY) < 0.15),
            lc_wake, lc_far)
        return np.minimum(near, wake)

    rect = np.array([[0, 0], [L, 0], [L, W], [0, W]], dtype=float)
    center = np.array([CX, CY])
    if symmetric_band:
        apts, atris, _inner, outer_ids = structured_annulus(
            center, R, lc_cyl, n_layers=3)
        ann = SimplexMesh("triangle", apts, atris).orient_positive()
        tri = triangulate_sizefield(
            rect, [], lc_fn, lc_min=lc_cyl,
            fixed_hole_loops=[apts[outer_ids]])
        tri = merge_meshes(tri, ann)
    else:
        th = np.linspace(0, 2 * np.pi, 128, endpoint=False)
        circle = np.stack(
            [CX + R * np.cos(th), CY + R * np.sin(th)], axis=1)
        tri = triangulate_sizefield(rect, [circle], lc_fn, lc_min=lc_cyl)
    # span resolution follows the UNSCALED cylinder lc (the z-direction
    # needs no extra refinement when cyl_factor shrinks in-plane cells)
    n_layers = max(4, int(np.ceil(W / (2.5 * 0.014 * scale))))
    msh = extrude_tri_mesh(tri, np.linspace(0.0, W, n_layers + 1))
    eps = 1e-9

    def on_pillar(p):
        return np.hypot(p[:, 0] - CX, p[:, 1] - CY) < R + 0.25 * lc_cyl

    mark_boundary_facets(msh, {
        2: lambda p: p[:, 0] < eps,
        3: lambda p: p[:, 0] > L - eps,
        5: on_pillar,
    }, default=4)
    return msh


@dataclasses.dataclass
class DFG3DResult:
    mesh: SimplexMesh
    u: np.ndarray
    p: np.ndarray
    cd: float                    # consistent reaction-force evaluation
    cl: float
    newton_iters: int
    converged: bool
    cd_surface: float = float("nan")   # reference traction integral
    cl_surface: float = float("nan")


def solve_dfg3d(scale: float = 1.0,
                solver: Optional[SolverConfig] = None,
                **mesh_kwargs) -> DFG3DResult:
    cfg = solver or SolverConfig()
    mesh = dfg3d_mesh(scale, **mesh_kwargs)
    Wsp = make_mixed_space(mesh, 1, 1)
    asm = assembler_for_mixed(Wsp)

    inlet = mesh.nodes_with_marker(2)
    walls = mesh.nodes_with_marker(4)
    obst = mesh.nodes_with_marker(5)

    def vdofs(nodes):
        return np.stack(
            [Wsp.velocity_dof(nodes, c) for c in range(3)], -1).ravel()

    iv = np.zeros((len(inlet), 3))
    y, z = mesh.points[inlet, 1], mesh.points[inlet, 2]
    iv[:, 0] = (4 * y * (W - y) / W**2) * (4 * z * (W - z) / W**2) * 0.45
    bc = combine_bcs([
        DirichletBC(vdofs(inlet), iv.ravel()),
        DirichletBC(vdofs(walls), np.zeros(3 * len(walls))),
        DirichletBC(vdofs(obst), np.zeros(3 * len(obst))),
    ])
    mask = jnp.asarray(bc_mask(Wsp.ndofs, bc), asm.dtype)
    g = jnp.asarray(bc_vector(Wsp.ndofs, bc), asm.dtype)

    stokes_k = make_stokes_kernel("tetrahedron", nu=1.0, mu_T_coeff=0.2)
    x = jnp.asarray(linear_host_lu(asm, stokes_k, mask, g))

    # transposed_stab=False: the textbook SUPS residual (u.grad)u, not the
    # reference's UFL dot(u, grad(u)) quirk ((grad u)^T u).  The quirk
    # residual is inconsistent (nonzero at the exact solution), which
    # poisons the consistent reaction-force functional: measured Cd
    # DIVERGES 7.27 -> 7.54 -> 8.03 under refinement with the quirk, and
    # converges with the textbook form.  The production channel solver
    # keeps the quirk behind its flag for field parity; validation apps
    # validate physics.
    for nu_step in (1e-1, 1e-2, 3e-3, NU):
        ns_k = make_ns_sups_kernel("tetrahedron", nu=nu_step,
                                   transposed_stab=False)
        nres = newton_host_lu(asm, ns_k, mask, g, x,
                              rtol=1e-8, atol=1e-9,
                              max_it=cfg.newton_max_it)
        x = jnp.asarray(nres.x)

    w = np.asarray(nres.x)
    u, p = Wsp.split(w)
    u, p = np.asarray(u), np.asarray(p)
    # consistent reaction force (superconvergent; see flow/forces.py)
    from ..flow.forces import reaction_force

    F = reaction_force(asm, ns_k, Wsp, mesh, w, 5)
    cd = 2 * F[0] / (UC**2 * LC_REF)
    cl = 2 * F[1] / (UC**2 * LC_REF)
    # the reference's traction surface integral, kept for parity
    Fs = -traction_force_3d(mesh, u, p, 5, NU)
    cd_s = 2 * Fs[0] / (UC**2 * LC_REF)
    cl_s = 2 * Fs[1] / (UC**2 * LC_REF)
    return DFG3DResult(mesh, u, p, float(cd), float(cl),
                       int(nres.iters), bool(nres.converged),
                       cd_surface=float(cd_s), cl_surface=float(cl_s))


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    scale = float(argv[0]) if argv else 1.5
    r = solve_dfg3d(scale)
    print(f"Velocity Degrees of Freedom: {3 * r.mesh.n_nodes}")
    print(f"Coefficient of Lift: {r.cl}")
    print(f"Coefficient of Drag: {r.cd}")
    return r


if __name__ == "__main__":
    main()
