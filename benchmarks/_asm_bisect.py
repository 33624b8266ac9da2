"""Probe 3: why assembly runs ~100x off HBM bandwidth (round 4).

Times cut-down variants of the residual pipeline at a given lc:
  gather      w[cell_dofs] + coords touch only
  geometry    + affine_geometry per cell
  kernel      full per-cell residual math (no scatter)
  segsum      the scatter-add alone on precomputed contributions
  residual    the real thing
All timed with host-read fences (block_until_ready is a no-op on the
tunneled axon buffers).

Run: python benchmarks/_asm_bisect.py [lc]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from stabilized_navier_stokes_flow_fenicsx_tpu.config import DEFAULT
from stabilized_navier_stokes_flow_fenicsx_tpu.flow.channel import (
    _setup_layered, generate_channel_mesh)
from stabilized_navier_stokes_flow_fenicsx_tpu.flow.inlet import (
    solve_inlet_profiles)
from stabilized_navier_stokes_flow_fenicsx_tpu.forms.navier_stokes import (
    make_ns_sups_kernel)
from stabilized_navier_stokes_flow_fenicsx_tpu.assemble.assembly import (
    AsmArrays, residual_of)
from stabilized_navier_stokes_flow_fenicsx_tpu.utils.testimg import (
    make_annulus_image)

lc = float(sys.argv[1]) if len(sys.argv) > 1 else 0.06
img = "/tmp/bench_circle.png"
if not os.path.exists(img):
    make_annulus_image(img, "circle")
inlet1, inlet2 = solve_inlet_profiles(img, 0.5, DEFAULT)
mesh, _, _ = generate_channel_mesh(img, lc, DEFAULT, layered=True)
W, lp, mask, g, g64 = _setup_layered(mesh, inlet1, inlet2)
arrays = lp.arrays
ndofs = lp.ndofs
kern = make_ns_sups_kernel("tetrahedron", nu=0.1)
asm_a = AsmArrays(cell_dofs=arrays.cell_dofs, cell_coords=arrays.cell_coords,
                  indices=arrays.cols, row_ids=arrays.row_ids,
                  ell_pos=arrays.ell_pos, diag_pos=arrays.diag_pos)
cd = arrays.cell_dofs
cc = arrays.cell_coords
nc, ndl = cd.shape
print(f"ndofs={ndofs} nc={nc} ndl={ndl}", flush=True)


def timeit(name, fn, *args, n=10):
    comp = jax.jit(fn).lower(*args).compile()
    out = comp(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32))
    t0 = time.time()
    for _ in range(n):
        out = comp(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32))
    dt = (time.time() - t0) / n
    print(f"{name:10s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


# 1. gather only
def gather(w):
    we = jnp.concatenate([w, jnp.zeros(1, w.dtype)])[cd]   # (nc, ndl)
    return we.sum() + cc.sum()


timeit("gather", gather, g)


# 2. per-cell kernel math without scatter
def kernel_only(w):
    we = jnp.concatenate([w, jnp.zeros(1, w.dtype)])[cd]
    r = jax.vmap(kern)(cc, we)                              # (nc, ndl)
    return r.sum()


timeit("kernel", kernel_only, g)


# 3. segment-sum alone
contrib = jnp.ones((nc, ndl), g.dtype)
rows_flat = cd.reshape(-1)


def segsum(c):
    return jax.ops.segment_sum(c.reshape(-1), rows_flat,
                               num_segments=ndofs + 1)


timeit("segsum", segsum, contrib)

# 4. the real residual
timeit("residual", lambda w: residual_of(kern, ndofs, asm_a, w), g)


# 5. EXPERIMENT: batch-minor kernel math — cells ride the LANES.
# Intermediates in the per-cell kernel are (qp, nv, dim, ...) with tiny
# trailing dims; batching cells on axis 0 puts those tiny dims in the
# (8, 128) tile => ~3% lane efficiency.  in_axes/out_axes=-1 keeps the
# cell axis minor through every elementwise op.
cdT = jnp.asarray(np.asarray(cd).T)            # (ndl, nc)
ccT = jnp.asarray(np.ascontiguousarray(np.asarray(cc).transpose(1, 2, 0)))


def kernel_T(w):
    we = jnp.concatenate([w, jnp.zeros(1, w.dtype)])[cdT]   # (ndl, nc)
    r = jax.vmap(kern, in_axes=(2, 1), out_axes=1)(ccT, we)
    return r.sum()


timeit("kernel_T", kernel_T, g)


def gather_T(w):
    we = jnp.concatenate([w, jnp.zeros(1, w.dtype)])[cdT]
    return we.sum() + ccT.sum()


timeit("gather_T", gather_T, g)
