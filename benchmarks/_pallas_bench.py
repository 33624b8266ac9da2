import os, time, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from stabilized_navier_stokes_flow_fenicsx_tpu.utils.testimg import make_annulus_image
from stabilized_navier_stokes_flow_fenicsx_tpu.flow.channel import generate_channel_mesh, _setup_layered
from stabilized_navier_stokes_flow_fenicsx_tpu.flow.inlet import solve_inlet_profiles
from stabilized_navier_stokes_flow_fenicsx_tpu.config import DEFAULT
from stabilized_navier_stokes_flow_fenicsx_tpu.forms.stokes import make_stokes_kernel
from stabilized_navier_stokes_flow_fenicsx_tpu.assemble.layered import layered_matvec, matrix_values_layered
from stabilized_navier_stokes_flow_fenicsx_tpu.assemble.pallas_spmv import build_ell, ell_values, layered_matvec_pallas

lc = float(sys.argv[1]) if len(sys.argv) > 1 else 0.04
img = "/tmp/bench_circle.png"
if not os.path.exists(img): make_annulus_image(img, "circle")
inlet1, inlet2 = solve_inlet_profiles(img, 0.5, DEFAULT)
mesh, _, _ = generate_channel_mesh(img, lc, DEFAULT, layered=True)
W, lp, mask, g, g64 = _setup_layered(mesh, inlet1, inlet2)
n2d, Lp, bs = lp.n2d, lp.n_planes, lp.bs
print(f"ndofs={W.ndofs} n2d={n2d} Lp={Lp} E={lp.E}", flush=True)
kern = make_stokes_kernel("tetrahedron", nu=1.0, mu_T_coeff=0.2)
vals = matrix_values_layered(kern, lp.E, Lp, bs, lp.arrays, g)
x = jnp.asarray(np.random.default_rng(0).normal(size=W.ndofs), vals.dtype)

f_xla = jax.jit(lambda v, x: layered_matvec(lp.arrays, n2d, Lp, v, x))
ell = build_ell(lp.arrays, n2d, Lp)
print(f"ELL D={ell.D} avg_deg={lp.E/n2d:.2f} Lpad={ell.Lpad}", flush=True)
v32 = ell_values(ell, vals)
v16 = ell_values(ell, vals, dtype=jnp.bfloat16)
f_p32 = jax.jit(lambda v, x: layered_matvec_pallas(ell, v, x, bs))
f_p16 = jax.jit(lambda v, x: layered_matvec_pallas(ell, v, x, bs))

def timeit(f, v, n=50):
    y = jax.block_until_ready(f(v, x))
    t0 = time.time()
    for _ in range(n):
        y = f(v, x)
    jax.block_until_ready(y)
    return (time.time() - t0) / n, y

t_xla, y0 = timeit(f_xla, vals)
t_p32, y1 = timeit(f_p32, v32)
t_p16, y2 = timeit(f_p16, v16)
e32 = float(jnp.abs(y1 - y0).max() / jnp.abs(y0).max())
e16 = float(jnp.abs(y2 - y0).max() / jnp.abs(y0).max())
print(f"xla f32:    {t_xla*1e3:.3f} ms")
print(f"pallas f32: {t_p32*1e3:.3f} ms  (x{t_xla/t_p32:.2f})  relerr={e32:.2e}")
print(f"pallas b16: {t_p16*1e3:.3f} ms  (x{t_xla/t_p16:.2f})  relerr={e16:.2e}")

from stabilized_navier_stokes_flow_fenicsx_tpu.assemble.pallas_spmv import ell_values_t, layered_matvec_ell
vt32 = ell_values_t(ell, vals)
vt16 = ell_values_t(ell, vals, dtype=jnp.bfloat16)
f_e32 = jax.jit(lambda v, x: layered_matvec_ell(ell, v, x, bs))
t_e32, y3 = timeit(f_e32, vt32)
t_e16, y4 = timeit(f_e32, vt16)
e3 = float(jnp.abs(y3 - y0).max() / jnp.abs(y0).max())
e4 = float(jnp.abs(y4 - y0).max() / jnp.abs(y0).max())
print(f"xla-ell f32: {t_e32*1e3:.3f} ms  (x{t_xla/t_e32:.2f})  relerr={e3:.2e}")
print(f"xla-ell b16: {t_e16*1e3:.3f} ms  (x{t_xla/t_e16:.2f})  relerr={e4:.2e}")
