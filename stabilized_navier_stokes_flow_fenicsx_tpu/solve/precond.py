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


def line_jacobi_layered(
    values: jnp.ndarray,          # (bs, bs, 3, E, Lp) layered matrix
    diag_pos: jnp.ndarray,        # (n2d,) self-pair ids
    mask: jnp.ndarray,            # (Lp*n2d*bs,)
    n2d: int,
    n_planes: int,
) -> Callable:
    """Vertical-line relaxation for extruded meshes.

    For each 2D node i, solve the block-tridiagonal system along its
    extrusion column (the self-pair's delta = -1/0/+1 blocks) — the
    strongest coupling direction of channel meshes.  All n2d columns
    factor and solve simultaneously: a blocked Thomas algorithm as a
    ``lax.scan`` over planes with (n2d, bs, bs) batched arithmetic.
    Strictly stronger than node-block Jacobi (which is its delta=0-only
    limit) at the cost of one scan per application.
    """
    from ..utils.linalg import inv_small

    bs = values.shape[0]
    Lp = n_planes
    mb = mask.reshape(Lp, n2d, bs)
    eye = jnp.eye(bs, dtype=values.dtype)
    sp = values[:, :, :, diag_pos, :]        # (bs, bs, 3, n2d, Lp)
    # build A (diag), B (lower: couples l -> l-1), C (upper: l -> l+1),
    # with constrained rows/cols projected to identity (match bc_operator)
    A = sp[:, :, 1].transpose(3, 2, 0, 1)    # (Lp, n2d, bs, bs)
    B = sp[:, :, 0].transpose(3, 2, 0, 1)    # x[l-1] coupling
    C = sp[:, :, 2].transpose(3, 2, 0, 1)    # x[l+1] coupling
    Pl = mb[:, :, :, None] * mb[:, :, None, :]
    A = A * Pl + jnp.einsum("lnb,bc->lnbc", 1.0 - mb, eye)
    # off-diagonals: rows of constrained dofs and columns of constrained
    # neighbor dofs are zeroed
    mb_m = jnp.concatenate([jnp.zeros_like(mb[:1]), mb[:-1]], axis=0)
    mb_p = jnp.concatenate([mb[1:], jnp.zeros_like(mb[:1])], axis=0)
    B = B * (mb[:, :, :, None] * mb_m[:, :, None, :])
    C = C * (mb[:, :, :, None] * mb_p[:, :, None, :])

    # blocked Thomas factorization: forward eliminate
    def fwd(carry, inp):
        Dprev_inv, Cprev = carry
        Al, Bl, Cl = inp
        D = Al - jnp.einsum("nij,njk,nkl->nil", Bl, Dprev_inv, Cprev,
                            preferred_element_type=Al.dtype)
        Dinv = inv_small(D)
        return (Dinv, Cl), (Dinv, Bl)

    zeros = jnp.zeros((n2d, bs, bs), values.dtype)
    eye_n = jnp.broadcast_to(eye, (n2d, bs, bs))
    (_, _), (Dinv, Bs) = jax.lax.scan(
        fwd, (eye_n, zeros), (A, B, C))

    C_all = C

    def apply(x):
        r = x.reshape(Lp, n2d, bs)

        def down(carry, inp):
            y_prev = carry
            rl, Dinv_l, Bl = inp
            y = jnp.einsum("nij,nj->ni", Dinv_l,
                           rl - jnp.einsum("nij,nj->ni", Bl, y_prev,
                                           preferred_element_type=x.dtype),
                           preferred_element_type=x.dtype)
            return y, y

        y0 = jnp.zeros((n2d, bs), x.dtype)
        _, Y = jax.lax.scan(down, y0, (r, Dinv, Bs))

        def up(carry, inp):
            x_next = carry
            yl, Dinv_l, Cl = inp
            xl = yl - jnp.einsum("nij,njk,nk->ni", Dinv_l, Cl, x_next,
                                 preferred_element_type=x.dtype)
            return xl, xl

        _, X = jax.lax.scan(up, y0, (Y, Dinv, C_all), reverse=True)
        return X.reshape(-1)

    return apply


def plane_gs_layered(
    values: jnp.ndarray,          # (bs, bs, 3, E, Lp)
    cols: jnp.ndarray,            # (E,)
    row_ids: jnp.ndarray,         # (E,) sorted
    diag_pos: jnp.ndarray,        # (n2d,)
    mask: jnp.ndarray,
    n2d: int,
    n_planes: int,
    inner_sweeps: int = 2,
    symmetric: bool = True,
    pc_dtype=None,
) -> Callable:
    """Plane-block Gauss-Seidel for the layered operator.

    Sweeps plane-by-plane downstream (and upstream when symmetric): each
    plane's 2D block system is relaxed with ``inner_sweeps`` Jacobi
    iterations using the plane-local 2D pairs.  Downstream sweeping
    follows the channel's advection, which makes the lower-triangular
    part of the NS Jacobian dominant — the classic line/plane relaxation
    for convection-dominated flow, in scan form.  Cuts FGMRES iterations
    ~4x vs node-block Jacobi on the channel Stokes system.
    """
    from ..utils.linalg import inv_small

    bs, _, _, E, Lp = values.shape
    mb = mask.reshape(Lp, n2d, bs)
    eye = jnp.eye(bs, dtype=values.dtype)
    # per-plane projected diagonal blocks + inverses
    diag = values[:, :, 1, diag_pos, :].transpose(3, 2, 0, 1)
    P = mb[:, :, :, None] * mb[:, :, None, :]
    diag = diag * P + jnp.einsum("lnb,bc->lnbc", 1.0 - mb, eye)
    Dinv = inv_small(diag)                   # (Lp, n2d, bs, bs)

    V0 = values[:, :, 1]                     # (bs, bs, E, Lp)
    Vm = values[:, :, 0]                     # x[l-1] coupling
    Vp = values[:, :, 2]                     # x[l+1] coupling
    if pc_dtype is not None:
        # the PC only steers FGMRES (right-preconditioned, flexible), so
        # reduced precision here is free bandwidth: bf16 halves the value
        # traffic of every sweep
        V0, Vm, Vp = (v.astype(pc_dtype) for v in (V0, Vm, Vp))
        Dinv = Dinv.astype(pc_dtype)
        mb = mb.astype(pc_dtype)
    rows_sorted = row_ids

    def spmv2d(Vl, x2d):
        # Vl: (bs, bs, E); x2d: (n2d, bs) — elementwise form (no
        # dot_general layout thrash, see layered_matvec)
        xj = x2d[cols].T                     # (bs, E)
        contrib = (Vl * xj[None, :, :]).sum(axis=1)      # (bs, E)
        return jax.ops.segment_sum(contrib.T, rows_sorted, num_segments=n2d,
                                   indices_are_sorted=True)

    def relax_plane(Vl, Dinv_l, ml, rhs, x0):
        x = x0
        for _ in range(inner_sweeps):
            res = (rhs - spmv2d(Vl, x * ml)) * ml + (1.0 - ml) * (rhs - x)
            x = x + jnp.einsum("nij,nj->ni", Dinv_l, res,
                               preferred_element_type=x.dtype)
        return x

    def apply(r):
        out_dtype = r.dtype
        if pc_dtype is not None:
            r = r.astype(pc_dtype)
        rb = r.reshape(Lp, n2d, bs)

        def down(x_prev, l):
            rl, ml, Dinv_l = rb[l], mb[l], Dinv[l]
            rhs = rl - spmv2d(Vm[..., l], x_prev)
            rhs = ml * rhs + (1.0 - ml) * rl
            x = relax_plane(V0[..., l], Dinv_l, ml, rhs,
                            jnp.einsum("nij,nj->ni", Dinv_l, rhs))
            return x, x

        x0 = jnp.zeros((n2d, bs), r.dtype)
        _, X = jax.lax.scan(down, x0, jnp.arange(Lp))
        if not symmetric:
            return X.reshape(-1).astype(out_dtype)

        def up(x_next, l):
            rl, ml, Dinv_l = rb[l], mb[l], Dinv[l]
            rhs = rl - spmv2d(Vp[..., l], x_next)
            rhs = ml * rhs + (1.0 - ml) * rl
            x = relax_plane(V0[..., l], Dinv_l, ml, rhs, X[l])
            return x, x

        _, X2 = jax.lax.scan(up, x0, jnp.arange(Lp), reverse=True)
        return X2.reshape(-1).astype(out_dtype)

    return apply


def scalar_jacobi(diag: jnp.ndarray, mask: jnp.ndarray) -> Callable:
    d = mask * diag + (1.0 - mask)
    inv = 1.0 / d

    def apply(x):
        return inv * x

    return apply
