import os, time, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from stabilized_navier_stokes_flow_fenicsx_tpu.utils.testimg import make_annulus_image
from stabilized_navier_stokes_flow_fenicsx_tpu.flow.channel import generate_channel_mesh, _setup_layered
from stabilized_navier_stokes_flow_fenicsx_tpu.flow.inlet import solve_inlet_profiles
from stabilized_navier_stokes_flow_fenicsx_tpu.config import DEFAULT
from stabilized_navier_stokes_flow_fenicsx_tpu.forms.navier_stokes import make_ns_sups_kernel
from stabilized_navier_stokes_flow_fenicsx_tpu.solve.driver import solve_newton_layered

lc = float(sys.argv[1]) if len(sys.argv) > 1 else 0.035
pcs = sys.argv[2].split(",") if len(sys.argv) > 2 else ["plane_gs_bf16", "mg_bf16"]
img = "/tmp/bench_circle.png"
if not os.path.exists(img): make_annulus_image(img, "circle")
inlet1, inlet2 = solve_inlet_profiles(img, 0.5, DEFAULT)
mesh, _, _ = generate_channel_mesh(img, lc, DEFAULT, layered=True)
W, lp, mask, g, _g, hier = _setup_layered(mesh, inlet1, inlet2, mg_levels=3)
print(f"ndofs={W.ndofs}", flush=True)
kern = make_ns_sups_kernel("tetrahedron", nu=0.1)

def run5(pc, mg):
    w, out = g, None
    for _ in range(5):
        out = solve_newton_layered(kern, lp.n2d, lp.n_planes, lp.bs,
            lp.arrays, mask, g, w, lp.E, 0.0, 0.0, 1, 1e-3, 50, 4, pc, mg)
        w = out.x
    jax.block_until_ready(out.x)
    return out

for pc in pcs:
    mg = hier if pc.startswith("mg") else None
    t0 = time.time(); out = run5(pc, mg); rn = float(out.resnorm)
    t_first = time.time() - t0
    t0 = time.time(); out = run5(pc, mg); rn = float(out.resnorm)
    t_steady = time.time() - t0
    print(f"{pc}: res={rn:.4f} first={t_first:.1f}s steady={t_steady:.1f}s", flush=True)
