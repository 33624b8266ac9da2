"""TPU microbench: layered SpMV with f32 vs bf16 value stream.

VERDICT round-2 item 7 acceptance: >1.2x on the ~345k SpMV microbench.
Run from /root/repo (axon): python benchmarks/_bf16_spmv_bench.py [lc]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

import bench


def main():
    lc = float(sys.argv[1]) if len(sys.argv) > 1 else 0.035
    from stabilized_navier_stokes_flow_fenicsx_tpu.assemble.layered import (
        layered_matvec, matrix_values_layered)
    from stabilized_navier_stokes_flow_fenicsx_tpu.forms.stokes import (
        make_stokes_kernel)

    os.environ.setdefault("BENCH_DEADLINE", str(time.time() + 3600))
    mesh, W, lp, mask, g, g64, hier = bench.build_problem(lc)
    print(f"ndofs={W.ndofs}", flush=True)
    kern = make_stokes_kernel("tetrahedron", nu=1.0, mu_T_coeff=0.2)
    V = matrix_values_layered(kern, lp.E, lp.n_planes, lp.bs, lp.arrays,
                              jnp.zeros(W.ndofs))
    V16 = V.astype(jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        W.ndofs).astype(np.float32))

    @jax.jit
    def mv32(V, x):
        return layered_matvec(lp.arrays, lp.n2d, lp.n_planes, V, x)

    @jax.jit
    def mv16(V, x):
        return layered_matvec(lp.arrays, lp.n2d, lp.n_planes, V, x)

    y32 = mv32(V, x).block_until_ready()
    y16 = mv16(V16, x).block_until_ready()
    rel = float(jnp.linalg.norm(y16 - y32) / jnp.linalg.norm(y32))
    print(f"bf16-vs-f32 rel diff: {rel:.3e} (expect ~1e-2..1e-3)",
          flush=True)

    def bench_mv(f, V, n=200):
        f(V, x).block_until_ready()
        t0 = time.time()
        y = x
        for _ in range(n):
            y = f(V, y)
        y.block_until_ready()
        return (time.time() - t0) / n

    # chain applications so each depends on the last (no overlap games)
    t32 = bench_mv(mv32, V)
    t16 = bench_mv(mv16, V16)
    print(f"f32  SpMV: {t32 * 1e3:.3f} ms")
    print(f"bf16 SpMV: {t16 * 1e3:.3f} ms   speedup {t32 / t16:.2f}x")


if __name__ == "__main__":
    main()
