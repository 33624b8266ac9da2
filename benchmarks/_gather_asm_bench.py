"""A/B: scatter (assemble_jacobian_chunked) vs gather-plan
(assemble_jacobian_gather) Jacobian assembly on the real chip.

Run: NS_TPU_GATHER_ASM=1 python benchmarks/_gather_asm_bench.py [lc]

(The env var is also set below before the package import: build_layered
only populates arrays.gtab/gtab_over under it, and this script reads
both unconditionally.)
"""
import os
import sys
import time

os.environ["NS_TPU_GATHER_ASM"] = "1"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    AsmArrays, assemble_jacobian_chunked, assemble_jacobian_gather)
from stabilized_navier_stokes_flow_fenicsx_tpu.utils.testimg import (
    make_annulus_image)

lc = float(sys.argv[1]) if len(sys.argv) > 1 else 0.06
img = "/tmp/linecr_circle.png"
if not os.path.exists(img):
    make_annulus_image(img, "circle")
inlet1, inlet2 = solve_inlet_profiles(img, 0.5, DEFAULT)
mesh, _, _ = generate_channel_mesh(img, lc, DEFAULT, layered=True)
t0 = time.time()
W, lp, mask, g, g64 = _setup_layered(mesh, inlet1, inlet2)
print(f"setup {time.time()-t0:.1f}s ndofs={lp.ndofs} cells={mesh.n_cells} "
      f"gtab={lp.arrays.gtab.shape} over={lp.arrays.gtab_over.shape}",
      flush=True)
arr = lp.arrays
kern = make_ns_sups_kernel("tetrahedron", nu=0.1)
nseg = lp.E * 3 * lp.n_planes
asm = AsmArrays(cell_dofs=arr.cell_dofs, cell_coords=arr.cell_coords,
                indices=arr.cols, row_ids=arr.row_ids,
                ell_pos=arr.ell_pos, diag_pos=arr.diag_pos)
rng = np.random.default_rng(0)
w = jnp.asarray(g) + 0.01 * jnp.asarray(
    rng.standard_normal(lp.ndofs), jnp.float32)

f_old = jax.jit(lambda w: assemble_jacobian_chunked(kern, nseg, lp.bs, asm, w))
f_new = jax.jit(lambda w: assemble_jacobian_gather(
    kern, nseg, lp.bs, asm, w, arr.gtab, arr.gtab_over, arr.gtab_over_ids))


def timeit(f, name, n=10):
    t0 = time.time()
    out = jax.block_until_ready(f(w))
    print(f"{name}: first {time.time()-t0:.2f}s", flush=True)
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(f(w))
    dt = (time.time() - t0) / n
    print(f"{name}: steady {dt*1e3:.1f} ms", flush=True)
    return out, dt


V_old, t_old = timeit(f_old, "scatter")
V_new, t_new = timeit(f_new, "gather ")
d = float(jnp.max(jnp.abs(V_new - V_old)))
r = float(jnp.max(jnp.abs(V_old)))
print(f"max|diff|={d:.3e} max|V|={r:.3e} speedup={t_old/t_new:.2f}x")
