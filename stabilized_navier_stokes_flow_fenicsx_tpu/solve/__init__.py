from .krylov import cg, bicgstab, fgmres, tfqmr, KrylovResult
from .precond import block_jacobi, identity_pc
from .newton import newton_solve, NewtonResult
