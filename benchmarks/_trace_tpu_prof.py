"""TPU profile of the streamtrace at the cached bench field
(benchmarks/_trace_field_make.py must have run first).

Replicates bench.run_trace_io's trace leg (forward seeds + 200x200
reverse grid) with per-phase timers and step statistics, so tracer
changes can be iterated without re-paying the Newton solve.

Run: python benchmarks/_trace_tpu_prof.py [lc=0.024] [n_grid=200]
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from stabilized_navier_stokes_flow_fenicsx_tpu.config import DEFAULT
from stabilized_navier_stokes_flow_fenicsx_tpu.io.xdmf import (
    read_xdmf_function)
from stabilized_navier_stokes_flow_fenicsx_tpu.fem.interpolate import (
    build_trace_locator)
from stabilized_navier_stokes_flow_fenicsx_tpu.trace import pipeline
from stabilized_navier_stokes_flow_fenicsx_tpu.trace.streamtrace import (
    TraceConfigDevice, trace_particles)


def main():
    lc = float(sys.argv[1]) if len(sys.argv) > 1 else 0.024
    n_grid = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    folder = f"/tmp/traceprof_{lc}"
    t0 = time.time()
    mesh, u = read_xdmf_function(f"{folder}/Velocity", "Velocity")
    seed_points = np.load(f"{folder}/seed_points.npy")
    print(f"read {time.time()-t0:.1f}s nv={len(mesh.points)}", flush=True)

    t0 = time.time()
    res = pipeline.for_and_rev_streamtrace(
        n_grid, f"{folder}/img.png", mesh, u, seed_points, DEFAULT)
    wall = time.time() - t0
    print(f"pipeline total {wall:.1f}s outlet_pts={len(res.outlet_points)}",
          flush=True)
    st = getattr(res, "stats", None)
    if st:
        print(json.dumps(st), flush=True)

    # isolated cost model: one full-width segment with all lanes active
    import jax.numpy as jnp
    from stabilized_navier_stokes_flow_fenicsx_tpu.trace.streamtrace import (
        init_trace_state, pack_u_cells, trace_segment)
    dloc = build_trace_locator(mesh)
    u_dev = jnp.asarray(u)
    u_cell = pack_u_cells(dloc, u_dev)
    rng = np.random.default_rng(0)
    # seeds in the duct interior -> every lane takes all seg_steps steps
    seeds = np.stack([rng.uniform(1.0, 3.0, 4096),
                      rng.uniform(0.35, 0.65, 4096),
                      rng.uniform(0.35, 0.65, 4096)], axis=1)
    cfg = TraceConfigDevice(t_max=1e9, max_steps=10**9,
                            x_stop=1e9, rtol=DEFAULT.trace.rtol,
                            atol=DEFAULT.trace.atol)
    stt = init_trace_state(jnp.asarray(seeds), cfg, dloc, u_cell)
    out = trace_segment(cfg, dloc, u_cell, stt, 64)
    np.asarray(out.x)  # sync + compile
    t0 = time.time()
    out = trace_segment(cfg, dloc, u_cell, out, 64)
    np.asarray(out.x)
    dt = time.time() - t0
    per_step = dt / 64 / 4096
    print(f"segment 64x4096: {dt*1e3:.1f} ms -> {per_step*1e9:.1f} ns "
          f"per lane-step ({per_step*1e9/6:.1f} ns per eval)", flush=True)


if __name__ == "__main__":
    main()
