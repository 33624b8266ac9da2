"""Split one headline Newton step's Krylov cost: V-cycle apply vs SpMV
vs iteration count, at the bench mesh.

Run: python benchmarks/_vcycle_probe.py [lc] [pc]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

lc = float(sys.argv[1]) if len(sys.argv) > 1 else 0.024
pc = sys.argv[2] if len(sys.argv) > 2 else "mg_cheby6_bf16"

import bench

os.environ.setdefault("BENCH_DEADLINE", str(time.time() + 3600))
ctx = bench.build_problem(lc)
lp, mask, g, hier = ctx["lp"], ctx["mask"], ctx["g"], ctx["hier"]
print(f"ndofs={ctx['W'].ndofs}", flush=True)

from stabilized_navier_stokes_flow_fenicsx_tpu.forms.navier_stokes import (
    make_ns_sups_kernel)
from stabilized_navier_stokes_flow_fenicsx_tpu.assemble.layered import (
    make_layered_op, matrix_values_layered)
from stabilized_navier_stokes_flow_fenicsx_tpu.solve.driver import (
    _layered_pc, solve_newton_layered)

kern = make_ns_sups_kernel("tetrahedron", nu=1.0 / 10.0)

# one Newton step from g to get an evolved state + its history
call, _, _ = bench.aot_newton_step(ctx, pc=pc)
out = call(kern, g)
w = out.x
hist = np.asarray(out.history)
print("newton hist [|F|, lam, ksp_iters, ksp_res]:", hist[0], flush=True)

vals = jax.jit(
    lambda arrays, w: matrix_values_layered(kern, lp.E, lp.n_planes,
                                            lp.bs, arrays, w)
)(lp.arrays, w)

x = jnp.asarray(np.random.default_rng(0).standard_normal(
    ctx["W"].ndofs), mask.dtype)

# big operands (arrays, vals, mask, hier) must be ARGUMENTS, not jit
# closure constants: constants inline into the StableHLO upload and trip
# the remote-compile body-size limit at 1M dofs.

def spmv_fn(arrays, v, m, xx, k=1):
    A = make_layered_op(arrays, lp.n2d, lp.n_planes, v, m)
    for _ in range(k):
        xx = A(xx)
    return xx


def pc_fn(arrays, v, m, h, xx, k=1):
    M = _layered_pc(pc, arrays, lp.n2d, lp.n_planes, m, h)(v)
    for _ in range(k):
        xx = M(xx)
    return xx


def timeit(f, args, n=10):
    y = f(*args)
    jax.block_until_ready(y)
    t0 = time.time()
    for _ in range(n):
        y = f(*args)
    jax.block_until_ready(y)
    return (time.time() - t0) / n


spmv_j = jax.jit(lambda a, v, m, xx: spmv_fn(a, v, m, xx, 1))
spmv16 = jax.jit(lambda a, v, m, xx: spmv_fn(a, v, m, xx, 16))
pc_j = jax.jit(lambda a, v, m, h, xx: pc_fn(a, v, m, h, xx, 1))
pc4 = jax.jit(lambda a, v, m, h, xx: pc_fn(a, v, m, h, xx, 4))
t_spmv = timeit(spmv_j, (lp.arrays, vals, mask, x))
t_spmv16 = timeit(spmv16, (lp.arrays, vals, mask, x)) / 16
t_pc = timeit(pc_j, (lp.arrays, vals, mask, hier, x))
t_pc4 = timeit(pc4, (lp.arrays, vals, mask, hier, x)) / 4
print(f"spmv: {t_spmv*1e3:.1f} ms/dispatch, {t_spmv16*1e3:.2f} ms chained",
      flush=True)
print(f"vcycle({pc}): {t_pc*1e3:.1f} ms/dispatch, {t_pc4*1e3:.2f} ms chained",
      flush=True)
its = int(hist[0][2])
print(f"krylov cost model: {its} its x (spmv {t_spmv16*1e3:.1f} + "
      f"vcycle {t_pc4*1e3:.1f}) = {its*(t_spmv16+t_pc4)*1e3:.0f} ms",
      flush=True)
