"""Multi-chip element sharding over a jax.sharding.Mesh.

TPU-native replacement for the reference's MPI domain decomposition
(SURVEY.md 2.3): DOLFINx partitions the mesh across ranks and exchanges
ghost dofs inside PETSc (reference NavierStokesChannelFlow.py:111,
:57-66).  Here the *elements* (and the matrix nonzeros) are sharded across
the device mesh axis; dof vectors stay replicated, and the ghost
ADD/REVERSE update becomes a single ``psum`` over ICI after each shard's
segment_sum.  No point-to-point, no ghost bookkeeping: the halo exchange
is the all-reduce the hardware is best at.

Padding scheme: cells (and nnz blocks) are padded to a multiple of the
device count; padded cells scatter into one extra dof/row segment that is
sliced off, and use copies of cell 0's coordinates so geometry stays
finite.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..assemble.assembly import Assembler
from ..solve.newton import NewtonResult, newton_solve
from ..solve.precond import block_jacobi


class ShardedArrays(NamedTuple):
    """AsmArrays padded + sharded along the cell / nnz axes."""

    cell_dofs: jnp.ndarray       # (nc_pad, ndl) -> P('cells')
    cell_coords: jnp.ndarray     # (nc_pad, nv, gdim) -> P('cells')
    ell_pos: jnp.ndarray         # (nc_pad, nbl, nbl) -> P('cells')
    indices: jnp.ndarray         # (nnzb_pad,) -> P('cells')
    row_ids: jnp.ndarray         # (nnzb_pad,) -> P('cells')
    diag_pos: jnp.ndarray        # (n_rows,) replicated


@dataclasses.dataclass
class ShardedProblem:
    mesh: Mesh
    arrays: ShardedArrays
    ndofs: int
    nnzb: int
    nnzb_pad: int
    bs: int
    n_rows: int
    axis: str = "cells"


def _pad_to(x: np.ndarray, n: int, fill) -> np.ndarray:
    pad = n - x.shape[0]
    if pad == 0:
        return x
    if np.isscalar(fill):
        tile = np.full((pad,) + x.shape[1:], fill, dtype=x.dtype)
    else:
        tile = np.broadcast_to(fill, (pad,) + x.shape[1:]).astype(x.dtype)
    return np.concatenate([x, tile], axis=0)


def make_sharded_problem(
    asm: Assembler, mesh: Mesh, axis: str = "cells"
) -> ShardedProblem:
    """Shard an Assembler's arrays over the device mesh axis."""
    nd = mesh.shape[axis]
    a = asm.arrays
    nc = a.cell_dofs.shape[0]
    nnzb = asm.pattern.nnzb
    nc_pad = -(-nc // nd) * nd
    nnzb_pad = -(-nnzb // nd) * nd

    cd = np.asarray(a.cell_dofs)
    cc = np.asarray(a.cell_coords)
    ep = np.asarray(a.ell_pos)
    # padded cells scatter into the extra dof segment (ndofs) and the
    # extra nnz segment (nnzb); coords copy cell 0 (finite geometry)
    cd_p = _pad_to(cd, nc_pad, np.int32(asm.ndofs))
    cc_p = _pad_to(cc, nc_pad, cc[0])
    ep_p = _pad_to(ep, nc_pad, np.int32(nnzb))
    idx_p = _pad_to(np.asarray(a.indices), nnzb_pad, np.int32(0))
    row_p = _pad_to(np.asarray(a.row_ids), nnzb_pad,
                    np.int32(asm.pattern.n_rows))

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    arrays = ShardedArrays(
        cell_dofs=jax.device_put(cd_p, shard),
        cell_coords=jax.device_put(cc_p, shard),
        ell_pos=jax.device_put(ep_p, shard),
        indices=jax.device_put(idx_p, shard),
        row_ids=jax.device_put(row_p, shard),
        diag_pos=jax.device_put(np.asarray(a.diag_pos), repl),
    )
    return ShardedProblem(
        mesh=mesh, arrays=arrays, ndofs=asm.ndofs, nnzb=nnzb,
        nnzb_pad=nnzb_pad, bs=asm.pattern.bs, n_rows=asm.pattern.n_rows,
        axis=axis)


# ---- sharded assembly/SpMV primitives (run inside shard_map) --------------


def _local_residual(kernel, ndofs, cell_dofs, cell_coords, w, axis):
    w_ext = jnp.concatenate([w, jnp.zeros(1, w.dtype)])
    w_e = w_ext[cell_dofs]
    r_e = jax.vmap(kernel)(cell_coords, w_e)
    r = jax.ops.segment_sum(
        r_e.reshape(-1), cell_dofs.reshape(-1), num_segments=ndofs + 1)
    return jax.lax.psum(r[:ndofs], axis)


def _local_jac_values(kernel, nnzb_true, nnzb_pad, bs, nbl, cell_dofs,
                      cell_coords, w, ell_pos, axis):
    """Replicated, psum'd block values padded to nnzb_pad (zeros beyond).

    Assembled with bs^2 strided segment-sums (no 5D transpose — it takes
    a 32x-padded TPU tile layout at scale).
    """
    w_ext = jnp.concatenate([w, jnp.zeros(1, w.dtype)])
    jac = getattr(kernel, "jac", None)

    def cell_jac(coords, w_e):
        return jax.jacfwd(lambda ww: kernel(coords, ww))(w_e)

    J_e = jax.vmap(jac if jac is not None else cell_jac)(
        cell_coords, w_ext[cell_dofs])
    seg = ell_pos.reshape(-1)
    outs = []
    for ci in range(bs):
        for cj in range(bs):
            outs.append(jax.ops.segment_sum(
                J_e[:, ci::bs, cj::bs].reshape(-1), seg,
                num_segments=nnzb_pad + 1))
    v = jnp.stack(outs, axis=-1).reshape(nnzb_pad + 1, bs, bs)
    # segment nnzb_true absorbs the padded cells' scatter; clear it
    v = v.at[nnzb_true].set(0.0)   # OOB scatter drops when true == pad
    return jax.lax.psum(v[:nnzb_pad], axis)


def _local_matvec(n_rows, values_pad, indices, row_ids, x, axis):
    """SpMV with nnz work sharded: each device handles its slice of the
    (padded) nnz axis, taking the matching slice of the replicated values.
    """
    bs = values_pad.shape[-1]
    sz = indices.shape[0]                      # local shard length
    my = jax.lax.axis_index(axis)
    zero = jnp.zeros((), my.dtype)
    vloc = jax.lax.dynamic_slice(
        values_pad, (my * sz, zero, zero), (sz, bs, bs))
    xb = x.reshape(-1, bs)
    contrib = jnp.einsum("nij,nj->ni", vloc, xb[indices],
                         preferred_element_type=values_pad.dtype)
    yb = jax.ops.segment_sum(contrib, row_ids, num_segments=n_rows + 1)
    return jax.lax.psum(yb[:n_rows].reshape(-1), axis)


def sharded_newton(
    prob: ShardedProblem,
    kernel: Callable,
    mask: jnp.ndarray,
    g: jnp.ndarray,
    w0: jnp.ndarray,
    rtol: float = 1e-8,
    atol: float = 1e-8,
    max_it: int = 30,
    ksp_rtol: float = 1e-8,
    ksp_restart: int = 50,
    ksp_max_restarts: int = 40,
) -> NewtonResult:
    """Full Newton solve with element-sharded assembly and nnz-sharded SpMV.

    The entire iteration runs inside one shard_map region: every device
    executes the (replicated) Krylov vector algebra and contributes its
    element/nnz shard through psums.
    """
    ax = prob.axis
    nbl = prob.arrays.ell_pos.shape[1]
    ndofs, nnzb, bs, n_rows = prob.ndofs, prob.nnzb, prob.bs, prob.n_rows
    nnzb_pad = prob.nnzb_pad

    @partial(
        jax.shard_map,
        mesh=prob.mesh,
        in_specs=(ShardedArrays(P(ax), P(ax), P(ax), P(ax), P(ax), P()),
                  P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    def run(arrays, mask_, g_, w0_):
        def residual(w):
            r = _local_residual(kernel, ndofs, arrays.cell_dofs,
                                arrays.cell_coords, w, ax)
            return mask_ * r + (1.0 - mask_) * (w - g_)

        def jac_values(w):
            return _local_jac_values(
                kernel, nnzb, nnzb_pad, bs, nbl, arrays.cell_dofs,
                arrays.cell_coords, w, arrays.ell_pos, ax)

        def make_op(values):
            def op(x):
                ax_y = _local_matvec(n_rows, values, arrays.indices,
                                     arrays.row_ids, mask_ * x, ax)
                return mask_ * ax_y + (1.0 - mask_) * x
            return op

        def make_pc(values):
            return block_jacobi(values[arrays.diag_pos], mask_)

        return newton_solve(
            residual, jac_values, make_op, make_pc, w0_,
            rtol=rtol, atol=atol, max_it=max_it, ksp_rtol=ksp_rtol,
            ksp_restart=ksp_restart, ksp_max_restarts=ksp_max_restarts)

    return run(prob.arrays, mask, g, w0)
