"""Poisson element kernel (the inlet fully-developed-flow solve).

Replicates the weak form of reference NavierStokes/image2inlet.py:267-270:
a = grad(u).grad(v) dx, L = p v dx with p = 10 — the axial momentum balance
for fully-developed laminar flow in the inlet cross-section.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ..assemble.assembly import affine_geometry
from ..fem.elements import element, quadrature


def make_poisson_kernel(
    cell: str, degree: int = 1, forcing: float = 10.0, qdeg: int = 2
) -> Callable:
    """Residual kernel r_a(w) = ∫ ∇w·∇φ_a − f φ_a dx over one element."""
    elem = element(cell, degree)
    qr = quadrature(cell, qdeg)
    phi_np, dphi_np = elem.tabulate(qr.points)
    dim = elem.dim

    def kernel(coords, w):
        dtype = w.dtype
        phi = jnp.asarray(phi_np, dtype)       # (nq, nd)
        dphi = jnp.asarray(dphi_np, dtype)     # (nq, nd, dim)
        wq = jnp.asarray(qr.weights, dtype)    # (nq,)
        _, invJ, detJ = affine_geometry(coords.astype(dtype), dim)
        # physical gradients: g[q, a, i] = dphi[q, a, k] invJ[k, i]
        g = jnp.einsum("qak,ki->qai", dphi, invJ)
        gu = jnp.einsum("qai,a->qi", g, w)     # (nq, dim)
        stiff = jnp.einsum("q,qi,qai->a", wq, gu, g)
        load = forcing * jnp.einsum("q,qa->a", wq, phi)
        return (stiff - load) * detJ

    return kernel
