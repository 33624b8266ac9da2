"""Stabilized Navier-Stokes element kernels.

Two stabilizations, matching the reference:

1. G-metric SUPS + LSIC (reference
   NavierStokes/NavierStokesChannelFlow.py:220-266):

     G = (dxi/dx)^T (dxi/dx),  C_I = 36
     tau_SUPS = 1 / sqrt(u.Gu + C_I nu^2 G:G)
     res_M    = dot(u, grad(u)) + grad(p)        [P1: div(2 nu sym grad u)=0]
     a  = (u.nabla_grad u).v + nu grad(u):grad(v) - p div(v) + q div(u)
        + tau_SUPS res_M . (dot(u, grad(v)) + grad(q))
        + nu_LSIC div(v) div(u),   nu_LSIC = 1/(tr(G) tau_SUPS)

   NOTE the UFL quirk preserved for parity: the reference's res_M and the
   SUPG test function use ``dot(u, grad(.))`` which in UFL contracts the
   *component* index — i.e. (grad u)^T u, not the advective (u.grad)u used
   in the Galerkin term (nabla_grad).  ``transposed_stab=False`` switches
   to the textbook SUPS residual.

2. UGN/Tezduyar tau (reference
   LidDrivenFlow/LidDrivenNavierStokesFlow.py:119-143):

     tau_SUPG = (tau_1^-2 + tau_3^-2)^(-1/2),  tau_1 = h/(2|u|) guarded at
     |u|<=1e-8, tau_3 = h^2/(4 nu);  Re_UGN = |u| h/(2 nu),
     z = min(Re_UGN/3, 1), tau_LSIC = (h/2) |u| z
     res = (u.nabla_grad)u + grad(p)             [P1 viscous term drops]
     a  = Galerkin + tau_SUPG (u.nabla_grad v).res + tau_SUPG grad(q).res
        + tau_LSIC div(v) div(u)

Jacobians come from ``jax.jacfwd`` of these kernels in assemble/ —
replacing UFL ``derivative`` + FFCx JIT (NavierStokesChannelFlow.py:253-254).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ..assemble.assembly import affine_geometry, cell_diameter
from ..fem.elements import element, quadrature


def make_ns_sups_kernel(
    cell: str,
    nu: float,
    C_I: float = 36.0,
    transposed_stab: bool = True,
    qdeg: int = 2,
) -> Callable:
    """G-metric SUPS/LSIC residual kernel on equal-order P1-P1."""
    elem = element(cell, 1)
    qr = quadrature(cell, qdeg)
    phi_np, dphi_np = elem.tabulate(qr.points)
    dim = elem.dim
    nv = elem.ndof
    bs = dim + 1

    def kernel(coords, w):
        dtype = w.dtype
        phi = jnp.asarray(phi_np, dtype)
        dphi = jnp.asarray(dphi_np, dtype)
        wq = jnp.asarray(qr.weights, dtype)
        coords = coords.astype(dtype)

        _, invJ, detJ = affine_geometry(coords, dim)
        # G_ij = sum_k (dxi_k/dx_i)(dxi_k/dx_j); invJ[k, i] = dxi_k/dx_i
        G = jnp.einsum("ki,kj->ij", invJ, invJ)
        trG = jnp.trace(G)
        GdG = jnp.sum(G * G)

        wb = w.reshape(nv, bs)
        u_n = wb[:, :dim]
        p_n = wb[:, dim]

        g = jnp.einsum("qak,ki->qai", dphi, invJ)      # (nq, nv, dim)
        u_q = jnp.einsum("qa,ai->qi", phi, u_n)        # (nq, dim)
        grad_u = jnp.einsum("qaj,ai->qij", g, u_n)     # du_i/dx_j
        grad_p = jnp.einsum("qai,a->qi", g, p_n)
        div_u = jnp.einsum("qii->q", grad_u)
        p_q = jnp.einsum("qa,a->q", phi, p_n)

        uGu = jnp.einsum("qi,ij,qj->q", u_q, G, u_q)
        tau = 1.0 / jnp.sqrt(uGu + C_I * nu * nu * GdG)
        nu_lsic = 1.0 / (trG * tau)

        adv = jnp.einsum("qij,qj->qi", grad_u, u_q)    # (u.grad)u
        if transposed_stab:
            res_m = jnp.einsum("qij,qi->qj", grad_u, u_q) + grad_p
        else:
            res_m = adv + grad_p

        # Galerkin momentum
        r_u = jnp.einsum("q,qi,qa->ai", wq, adv, phi)
        r_u += nu * jnp.einsum("q,qij,qaj->ai", wq, grad_u, g)
        r_u -= jnp.einsum("q,q,qai->ai", wq, p_q, g)
        # Galerkin continuity
        r_p = jnp.einsum("q,q,qa->a", wq, div_u, phi)

        # SUPS: tau res_M . (dot(u, grad v) + grad q)
        res_dot_g = jnp.einsum("qj,qaj->qa", res_m, g)     # res_M . grad(phi_a)
        if transposed_stab:
            # test part dot(u, grad(v)) for v = phi_a e_i -> u_i (res.grad phi_a)
            r_u += jnp.einsum("q,q,qi,qa->ai", wq, tau, u_q, res_dot_g)
        else:
            # textbook: tau res_i (u . grad phi_a)
            u_dot_g = jnp.einsum("qj,qaj->qa", u_q, g)
            r_u += jnp.einsum("q,q,qi,qa->ai", wq, tau, res_m, u_dot_g)
        r_p += jnp.einsum("q,qa->a", wq * tau, res_dot_g)

        # LSIC: nu_lsic div(v) div(u)   (nu_lsic varies per qp through tau)
        r_u += jnp.einsum("q,q,qai->ai", wq * nu_lsic, div_u, g)

        r = jnp.concatenate([r_u, r_p[:, None]], axis=1).reshape(-1)
        return r * detJ

    return kernel


def make_ns_ugn_kernel(
    cell: str,
    nu: float,
    qdeg: int = 2,
) -> Callable:
    """UGN/Tezduyar-tau stabilized NS kernel (lid-driven variant)."""
    elem = element(cell, 1)
    qr = quadrature(cell, qdeg)
    phi_np, dphi_np = elem.tabulate(qr.points)
    dim = elem.dim
    nv = elem.ndof
    bs = dim + 1

    def kernel(coords, w):
        dtype = w.dtype
        phi = jnp.asarray(phi_np, dtype)
        dphi = jnp.asarray(dphi_np, dtype)
        wq = jnp.asarray(qr.weights, dtype)
        coords = coords.astype(dtype)

        _, invJ, detJ = affine_geometry(coords, dim)
        h = cell_diameter(coords)

        wb = w.reshape(nv, bs)
        u_n = wb[:, :dim]
        p_n = wb[:, dim]

        g = jnp.einsum("qak,ki->qai", dphi, invJ)
        u_q = jnp.einsum("qa,ai->qi", phi, u_n)
        grad_u = jnp.einsum("qaj,ai->qij", g, u_n)
        grad_p = jnp.einsum("qai,a->qi", g, p_n)
        div_u = jnp.einsum("qii->q", grad_u)
        p_q = jnp.einsum("qa,a->q", phi, p_n)

        u_sq = jnp.sum(u_q * u_q, axis=1)
        # |u| with a derivative-safe floor (kernel is differentiated by
        # jacfwd; bare sqrt has a NaN gradient at u = 0 which happens on
        # all-wall cells of coarse meshes).  finfo.tiny keeps the guard
        # representable in f32 on TPU.
        u_norm = jnp.sqrt(u_sq + jnp.finfo(dtype).tiny)
        # tau_1 = h/(2|u|) with the reference's guard at |u| <= 1e-8
        inv_tau1_sq = jnp.where(u_norm <= 1e-8, 0.0, 4.0 * u_sq / (h * h))
        tau3 = h * h / (4.0 * nu)
        tau_supg = 1.0 / jnp.sqrt(inv_tau1_sq + 1.0 / tau3**2)
        re_ugn = u_norm * h / (2.0 * nu)
        z = jnp.minimum(re_ugn / 3.0, 1.0)
        tau_lsic = 0.5 * h * u_norm * z

        adv = jnp.einsum("qij,qj->qi", grad_u, u_q)
        res = adv + grad_p                       # P1: viscous term vanishes

        r_u = jnp.einsum("q,qi,qa->ai", wq, adv, phi)
        r_u += nu * jnp.einsum("q,qij,qaj->ai", wq, grad_u, g)
        r_u -= jnp.einsum("q,q,qai->ai", wq, p_q, g)
        r_p = jnp.einsum("q,q,qa->a", wq, div_u, phi)

        u_dot_g = jnp.einsum("qj,qaj->qa", u_q, g)       # u . grad(phi_a)
        r_u += jnp.einsum("q,qi,qa->ai", wq * tau_supg, res, u_dot_g)
        res_dot_g = jnp.einsum("qi,qai->qa", res, g)
        r_p += jnp.einsum("q,qa->a", wq * tau_supg, res_dot_g)
        r_u += jnp.einsum("q,q,qai->ai", wq * tau_lsic, div_u, g)

        r = jnp.concatenate([r_u, r_p[:, None]], axis=1).reshape(-1)
        return r * detJ

    return kernel
