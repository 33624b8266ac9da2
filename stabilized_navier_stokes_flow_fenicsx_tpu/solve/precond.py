"""Preconditioners for the block-CSR operators.

TPU-native stand-in for PETSc's ASM/LU stack (SURVEY.md 2.2).  The workhorse
is node-block Jacobi: with the equal-order P1-P1 layout every mesh node
carries a (dim+1)x(dim+1) diagonal block coupling its velocity components
and pressure — inverting all of them is one batched 4x4 solve, a perfect
VPU/MXU shape.  Constrained (Dirichlet) rows/cols are projected to identity
so the preconditioner matches the bc_operator.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..utils.linalg import inv_small


def identity_pc() -> Callable:
    return lambda x: x


def block_jacobi(diag_blocks: jnp.ndarray, mask: jnp.ndarray) -> Callable:
    """M^{-1} from node-diagonal blocks.

    diag_blocks: (n_rows, bs, bs); mask: (n_rows*bs,) 1 on free dofs.
    Returns a closure x -> D^{-1} x consistent with
    A_bc = P A P + (I - P): each block is projected (P_b D P_b + I - P_b)
    before inversion.
    """
    n, bs, _ = diag_blocks.shape
    mb = mask.reshape(n, bs)
    P = mb[:, :, None] * mb[:, None, :]                    # (n, bs, bs)
    eye = jnp.eye(bs, dtype=diag_blocks.dtype)
    # P_b D_b P_b + diag(1 - m_b)
    Dproj = diag_blocks * P + jnp.einsum("nb,bc->nbc", 1.0 - mb, eye)
    Dinv = inv_small(Dproj)

    def apply(x):
        xb = x.reshape(n, bs)
        yb = jnp.einsum("nij,nj->ni", Dinv, xb,
                        preferred_element_type=x.dtype)
        return yb.reshape(-1)

    return apply


def scalar_jacobi(diag: jnp.ndarray, mask: jnp.ndarray) -> Callable:
    d = mask * diag + (1.0 - mask)
    inv = 1.0 / d

    def apply(x):
        return inv * x

    return apply
