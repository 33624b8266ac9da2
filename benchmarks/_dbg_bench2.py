import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ["JAX_TRACEBACK_FILTERING"] = "off"
sys.path.insert(0, "/root/repo")
import numpy as np, jax
import bench
from stabilized_navier_stokes_flow_fenicsx_tpu.forms.navier_stokes import make_ns_sups_kernel
from stabilized_navier_stokes_flow_fenicsx_tpu.solve.driver import solve_newton_layered
from stabilized_navier_stokes_flow_fenicsx_tpu.flow.channel import _setup_layered, generate_channel_mesh
from stabilized_navier_stokes_flow_fenicsx_tpu.flow.inlet import solve_inlet_profiles
from stabilized_navier_stokes_flow_fenicsx_tpu.config import DEFAULT
from stabilized_navier_stokes_flow_fenicsx_tpu.utils.testimg import make_annulus_image

lc = float(sys.argv[1]); lv = int(sys.argv[2]); pc = sys.argv[3]
img = "/tmp/bench_circle.png"
if not os.path.exists(img): make_annulus_image(img, "circle")
inlet1, inlet2 = solve_inlet_profiles(img, 0.5, DEFAULT)
mesh, _, _ = generate_channel_mesh(img, lc, DEFAULT, layered=True)
out = _setup_layered(mesh, inlet1, inlet2, mg_levels=lv)
W, lp, mask, g = out[0], out[1], out[2], out[3]
hier = out[5] if lv > 0 else None
print(f"ndofs={W.ndofs}", flush=True)
kern = make_ns_sups_kernel("tetrahedron", nu=0.1)
def run5():
    w, out5 = g, None
    for _ in range(5):
        out5 = solve_newton_layered(kern, lp.n2d, lp.n_planes, lp.bs,
            lp.arrays, mask, g, w, lp.E, 0.0, 0.0, 1, 1e-3, 50, 4, pc, hier)
        w = out5.x
    jax.block_until_ready(out5.x)
    return out5
t0=time.time(); o = run5(); rn=float(o.resnorm); print(f"first={time.time()-t0:.1f}s res={rn:.4f}", flush=True)
t0=time.time(); o = run5(); rn=float(o.resnorm); print(f"steady={time.time()-t0:.1f}s res={rn:.4f}", flush=True)
