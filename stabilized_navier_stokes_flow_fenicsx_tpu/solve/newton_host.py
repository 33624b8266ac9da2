"""Newton with a host sparse-LU inner solve (the reference's MUMPS path).

The 2D validation problems (DFG cylinder, lid-driven at high Re) are small
and advection-dominated; the reference solves their Newton updates with a
direct factorization (preonly+mumps, reference
Validation_Flow/DFG_2D_Validation.py:115-120, 169-189;
LidDrivenFlow/LidDrivenNavierStokesFlow.py:160-169).  This driver keeps
residual/Jacobian assembly on the device (vmapped kernels) and runs the
update solve through scipy's SuperLU — the same division of labor, with
the host factorization standing in for MUMPS.

For the large 3D systems use solve/driver.py (device Krylov) instead.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp
import numpy as np

from ..assemble.assembly import Assembler, matrix_values_of, residual_of


class HostNewtonResult(NamedTuple):
    x: np.ndarray
    iters: int
    resnorm: float
    converged: bool
    history: list


def linear_host_lu(
    asm: Assembler,
    kernel: Callable,
    mask: jnp.ndarray,
    g: jnp.ndarray,
) -> np.ndarray:
    """Affine-form solve by host sparse LU (the reference's preonly+mumps
    LinearProblem, DFG_2D_Validation.py:115-120)."""
    from scipy.sparse.linalg import splu

    mask_np = np.asarray(mask)
    g_np = np.asarray(g)
    free = mask_np > 0.5
    pat = asm.pattern
    zero = jnp.zeros(asm.ndofs, asm.dtype)
    values = np.asarray(matrix_values_of(
        kernel, pat.nnzb, pat.bs, asm.arrays, zero))
    b = -np.asarray(residual_of(kernel, asm.ndofs, asm.arrays, zero))
    A = pat.to_scipy(values).tocsr()
    rhs = b[free] - A[free][:, ~free] @ g_np[~free]
    Aff = A[free][:, free].tolil()
    # MUMPS ICNTL(24)=1 / ICNTL(25)=0 equivalent (DuctStokesFlow.py:213-216):
    # null-pivot rows (pressure dofs whose velocity couplings are all
    # constrained, e.g. inlet-rim vertices of the TH duct) get an identity
    # row and a zero value.
    rn = np.asarray(np.abs(A[free][:, free]).sum(axis=1)).ravel()
    dead = rn < 1e-12 * max(rn.max(), 1.0)
    if dead.any():
        for i in np.nonzero(dead)[0]:
            Aff[i, i] = 1.0
        rhs = np.where(dead, 0.0, rhs)
    x = g_np.copy()
    x[free] = splu(Aff.tocsc()).solve(rhs)
    return x


def newton_host_lu(
    asm: Assembler,
    kernel: Callable,
    mask: jnp.ndarray,
    g: jnp.ndarray,
    w0: jnp.ndarray,
    rtol: float = 1e-9,
    atol: float = 1e-10,
    max_it: int = 30,
    max_backtracks: int = 10,
) -> HostNewtonResult:
    from scipy.sparse.linalg import splu

    mask_np = np.asarray(mask)
    g_np = np.asarray(g)
    free = mask_np > 0.5
    pat = asm.pattern

    def residual(w):
        r = np.asarray(residual_of(kernel, asm.ndofs, asm.arrays,
                                   jnp.asarray(w)))
        return mask_np * r + (1.0 - mask_np) * (w - g_np)

    x = np.asarray(w0, dtype=np.float64)
    F = residual(x)
    n0 = np.linalg.norm(F)
    tol = max(rtol * n0, atol)
    history = []
    it = 0
    while np.linalg.norm(F) > tol and it < max_it:
        values = np.asarray(matrix_values_of(
            kernel, pat.nnzb, pat.bs, asm.arrays, jnp.asarray(x)))
        A = pat.to_scipy(values).tocsr()
        Aff = A[free][:, free].tocsc()
        lu = splu(Aff)
        dx = np.zeros_like(x)
        dx[free] = lu.solve(-F[free])
        # BC rows: keep constrained dofs pinned
        dx[~free] = -(x[~free] - g_np[~free])

        fnorm = np.linalg.norm(F)
        lam = 1.0
        for _ in range(max_backtracks):
            trial = residual(x + lam * dx)
            tnorm = np.linalg.norm(trial)
            if tnorm < (1.0 - 1e-4 * lam) * fnorm:
                break
            lam *= 0.5
        x = x + lam * dx
        F = residual(x)
        it += 1
        history.append((float(np.linalg.norm(F)), lam))
    rn = float(np.linalg.norm(F))
    return HostNewtonResult(x, it, rn, rn <= tol, history)
