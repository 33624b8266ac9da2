import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import numpy as np, jax
from stabilized_navier_stokes_flow_fenicsx_tpu.utils.testimg import make_annulus_image
from stabilized_navier_stokes_flow_fenicsx_tpu.flow.channel import generate_channel_mesh, _setup_layered
from stabilized_navier_stokes_flow_fenicsx_tpu.flow.inlet import solve_inlet_profiles
from stabilized_navier_stokes_flow_fenicsx_tpu.config import DEFAULT
from stabilized_navier_stokes_flow_fenicsx_tpu.forms.stokes import make_stokes_kernel
from stabilized_navier_stokes_flow_fenicsx_tpu.solve.driver import solve_linear_layered
img = "/tmp/bench_circle.png"
if not os.path.exists(img): make_annulus_image(img, "circle")
inlet1, inlet2 = solve_inlet_profiles(img, 0.5, DEFAULT)
lc = float(__import__("sys").argv[1]) if len(__import__("sys").argv)>1 else 0.05
mesh, _, _ = generate_channel_mesh(img, lc, DEFAULT, layered=True)
W, lp, mask, g, g64, hier = _setup_layered(mesh, inlet1, inlet2, mg_levels=3)
print(f"ndofs={W.ndofs}", flush=True)
kern = make_stokes_kernel("tetrahedron", nu=1.0, mu_T_coeff=0.2)
import sys as _s
pcs = _s.argv[2].split(",") if len(_s.argv) > 2 else ["plane_gs_bf16", "mg_bf16"]
for pc, mg in [(p, hier if p.startswith("mg") else None) for p in pcs]:
    t0=time.time()
    res = solve_linear_layered(kern, lp.n2d, lp.n_planes, lp.bs, lp.arrays,
        mask, g, lp.E, 1e-6, 50, pc, mg)
    rn = float(res.resnorm); it = int(res.iters); t_first = time.time()-t0
    t0=time.time()
    res = solve_linear_layered(kern, lp.n2d, lp.n_planes, lp.bs, lp.arrays,
        mask, g, lp.E, 1e-6, 50, pc, mg)
    rn = float(res.resnorm); t_steady = time.time()-t0
    print(f"{pc}: iters={int(res.iters)} conv={bool(res.converged)} res={rn:.2e} first={t_first:.1f}s steady={t_steady:.1f}s", flush=True)
