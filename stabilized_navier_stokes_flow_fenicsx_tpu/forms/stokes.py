"""Stabilized Stokes element kernel (pressure-stabilized P1-P1).

Replicates the channel Stokes weak form of reference
NavierStokes/NavierStokesChannelFlow.py:160-172:

    a = grad(u):grad(v) - p div(v) + q div(u) + mu_T grad(p).grad(q)
    mu_T = 0.2 h^2                       (h = UFL CellDiameter)
    L = f.v - mu_T f.grad(q),  f = 0

and the nu-scaled lid-driven variant
(reference LidDrivenFlow/LidDrivenNavierStokesFlow.py:86-99):

    a = nu grad(u):grad(v) - p div(v) + q div(u) + mu_T grad(p).grad(q)
    mu_T = (1/3) h^2 / (4 nu)

Local dof layout is node-major [u_x, u_y, (u_z), p] per node — the
equal-order mixed layout of fem/space.py.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from ..assemble.assembly import affine_geometry, cell_diameter
from ..fem.elements import element, quadrature
from ..utils.kernelbase import ElementKernel


def make_stokes_kernel(
    cell: str,
    nu: float = 1.0,
    mu_T_coeff: float = 0.2,
    nu_scaled_stab: bool = False,
    qdeg: int = 2,
    forcing: Optional[np.ndarray] = None,
) -> Callable:
    """Residual kernel for the stabilized Stokes form on P1-P1.

    nu_scaled_stab=False: mu_T = mu_T_coeff * h^2           (channel form)
    nu_scaled_stab=True:  mu_T = mu_T_coeff * h^2 / (4 nu)  (lid-driven form)

    Returns an ElementKernel pytree: (nu, mu_T_coeff, forcing) are traced
    leaves (one compiled program per mesh across parameter values,
    utils/kernelbase.py)."""
    elem = element(cell, 1)
    f_np = np.zeros(elem.dim) if forcing is None \
        else np.asarray(forcing, float)
    return ElementKernel(_stokes_fn(cell, nu_scaled_stab, qdeg), None,
                         (nu, mu_T_coeff, f_np))


@functools.lru_cache(maxsize=None)
def _stokes_fn(cell: str, nu_scaled_stab: bool, qdeg: int):
    elem = element(cell, 1)
    qr = quadrature(cell, qdeg)
    phi_np, dphi_np = elem.tabulate(qr.points)
    dim = elem.dim
    nv = elem.ndof
    bs = dim + 1

    def kernel(params, coords, w):
        dtype = w.dtype
        nu, mu_T_coeff, fvec = (
            jnp.asarray(p).astype(dtype) for p in params)
        phi = jnp.asarray(phi_np, dtype)        # (nq, nv)
        dphi = jnp.asarray(dphi_np, dtype)      # (nq, nv, dim)
        wq = jnp.asarray(qr.weights, dtype)
        coords = coords.astype(dtype)

        _, invJ, detJ = affine_geometry(coords, dim)
        h = cell_diameter(coords)
        mu_T = (mu_T_coeff * h * h / (4.0 * nu)) if nu_scaled_stab \
            else (mu_T_coeff * h * h)

        wb = w.reshape(nv, bs)
        u_n = wb[:, :dim]                        # (nv, dim) nodal velocity
        p_n = wb[:, dim]                         # (nv,) nodal pressure

        g = jnp.einsum("qak,ki->qai", dphi, invJ)        # (nq, nv, dim)
        grad_u = jnp.einsum("qaj,ai->qij", g, u_n)       # du_i/dx_j
        grad_p = jnp.einsum("qai,a->qi", g, p_n)         # (nq, dim)
        div_u = jnp.einsum("qii->q", grad_u)
        p_q = jnp.einsum("qa,a->q", phi, p_n)

        # momentum rows r_u[a, i]
        r_u = nu * jnp.einsum("q,qij,qaj->ai", wq, grad_u, g)
        r_u -= jnp.einsum("q,q,qai->ai", wq, p_q, g)
        r_u -= jnp.einsum("q,i,qa->ai", wq, fvec, phi)
        # continuity rows r_p[a]
        r_p = jnp.einsum("q,q,qa->a", wq, div_u, phi)
        r_p += mu_T * jnp.einsum("q,qi,qai->a", wq, grad_p, g)
        r_p += mu_T * jnp.einsum("q,i,qai->a", wq, fvec, g)

        r = jnp.concatenate([r_u, r_p[:, None]], axis=1).reshape(-1)
        return r * detJ

    return kernel
