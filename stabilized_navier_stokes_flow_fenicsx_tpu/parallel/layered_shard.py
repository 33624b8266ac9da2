"""Plane-sharded layered operator: the flagship fast path on a device mesh.

VERDICT round-1 item 7: the layered operator (assemble/layered.py) was
single-chip only; the generic sharded Newton (parallel/shard.py) covers
block-CSR with replicated vectors.  Here the *plane* axis of the extruded
channel becomes the device-mesh axis:

* dof vectors are row-partitioned — each device owns a contiguous block
  of planes (no replication, the memory axis that matters at 10^6+ dofs);
* the value tensor (bs, bs, 3, E, Lp) is sharded on its plane axis;
* the tridiagonal plane coupling means the SpMV's shifted reads touch
  exactly ONE neighbouring plane per direction — XLA lowers the shifted
  concatenation to nearest-neighbour collective-permutes over ICI, the
  ppermute halo exchange of the design (TODO round-1), without hand-written
  collectives (the scaling-book recipe: annotate shardings, let XLA insert
  the collectives);
* Krylov dot products/norms become psums automatically.

This replaces the reference's MPI domain decomposition along the channel
(reference NavierStokesChannelFlow.py:111 partitions unstructured; an
extruded channel partitions naturally into plane slabs).

Plane padding: Lp is rounded up to a multiple of the device count; padded
planes are Dirichlet identity rows (mask 0, g 0) that never couple back —
``pad_planes_setup`` prepares the padded mask/g and the build uses
``build_layered(space, n2d, Lp_pad)``, whose segment layout simply gains
zero-valued tail planes.

The preconditioner is node-block Jacobi (purely local).  The sequential
plane-GS/MG smoothers would serialize across devices; a sharded MG is
future work (additive plane-block variant).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..assemble.assembly import AsmArrays, residual_of
from ..assemble.layered import (LayeredArrays, layered_diag_blocks,
                                layered_matvec, matrix_values_layered)
from ..solve.newton import NewtonResult, newton_solve
from ..solve.precond import block_jacobi


def padded_planes(n_planes: int, n_devices: int) -> int:
    return -(-n_planes // n_devices) * n_devices


def pad_mask_g(mask_np: np.ndarray, g_np: np.ndarray, ndofs_pad: int):
    """Extend BC mask/values over the padded planes: constrained to 0."""
    pad = ndofs_pad - mask_np.shape[0]
    if pad == 0:
        return mask_np, g_np
    return (np.concatenate([mask_np, np.zeros(pad, mask_np.dtype)]),
            np.concatenate([g_np, np.zeros(pad, g_np.dtype)]))


def shard_layered_inputs(lp, mask, g, w0, device_mesh: Mesh,
                         axis: str = "planes"):
    """device_put the problem onto the mesh: vectors plane-partitioned,
    cell data replicated (element work is duplicated for now — the value
    tensor and every solver vector, the memory that scales, are sharded)."""
    xs = NamedSharding(device_mesh, P(axis))
    repl = NamedSharding(device_mesh, P())
    arrays = LayeredArrays(*(jax.device_put(a, repl) for a in lp.arrays))
    return arrays, (jax.device_put(jnp.asarray(mask), xs),
                    jax.device_put(jnp.asarray(g), xs),
                    jax.device_put(jnp.asarray(w0), xs))


@partial(jax.jit,
         static_argnums=(0, 1, 2, 3, 4, 5, 6) + tuple(range(11, 17)))
def _sharded_newton_layered(
    kernel: Callable,
    n2d: int,
    n_planes: int,                # padded: multiple of the device count
    bs: int,
    E: int,
    device_mesh: Mesh,            # hashable -> static
    axis: str,
    arrays: LayeredArrays,
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
    ndofs = n2d * n_planes * bs
    xs = NamedSharding(device_mesh, P(axis))
    vs = NamedSharding(device_mesh, P(None, None, None, None, axis))
    ds = NamedSharding(device_mesh, P(axis, None, None))
    asm_arrays = AsmArrays(
        cell_dofs=arrays.cell_dofs, cell_coords=arrays.cell_coords,
        indices=arrays.cols, row_ids=arrays.row_ids,
        ell_pos=arrays.ell_pos, diag_pos=arrays.diag_pos)

    def residual(w):
        r = jax.lax.with_sharding_constraint(
            residual_of(kernel, ndofs, asm_arrays, w), xs)
        return mask * r + (1.0 - mask) * (w - g)

    def jac_values(w):
        V = matrix_values_layered(kernel, E, n_planes, bs, arrays, w)
        return jax.lax.with_sharding_constraint(V, vs)

    def make_op(values):
        def op(x):
            y = layered_matvec(arrays, n2d, n_planes, values, mask * x)
            y = jax.lax.with_sharding_constraint(y, xs)
            return mask * y + (1.0 - mask) * x
        return op

    def make_pc(values):
        d = jax.lax.with_sharding_constraint(
            layered_diag_blocks(arrays, n2d, values), ds)
        return block_jacobi(d, mask)

    return newton_solve(
        residual, jac_values, make_op, make_pc, w0,
        rtol=rtol, atol=atol, max_it=max_it, ksp_rtol=ksp_rtol,
        ksp_restart=ksp_restart, ksp_max_restarts=ksp_max_restarts)


def sharded_newton_layered(
    kernel: Callable,
    lp,                            # LayeredPattern built with padded planes
    mask,
    g,
    w0,
    device_mesh: Mesh,
    axis: str = "planes",
    **tols,
) -> NewtonResult:
    """Plane-sharded Newton solve on the layered operator.

    ``lp.n_planes`` must be a multiple of ``device_mesh.shape[axis]``
    (use build_layered(space, n2d, padded_planes(Lp, D)) + pad_mask_g).
    """
    D = device_mesh.shape[axis]
    assert lp.n_planes % D == 0, (lp.n_planes, D)
    arrays, (mask_s, g_s, w0_s) = shard_layered_inputs(
        lp, mask, g, w0, device_mesh, axis)
    return _sharded_newton_layered(
        kernel, lp.n2d, lp.n_planes, lp.bs, lp.E, device_mesh, axis,
        arrays, mask_s, g_s, w0_s, **tols)
