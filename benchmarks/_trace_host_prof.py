#!/usr/bin/env python
"""Profile the trace pipeline's HOST-side costs at the bench mesh
(round-5: locator_build_s 19.5 s + ~12 s unattributed in fwd_s).

Caches the bench mesh to /tmp/bench_mesh.npz so iterations skip the
~40 s host meshing.
"""

import cProfile
import io
import os
import pstats
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def get_mesh(lc=0.024):
    from stabilized_navier_stokes_flow_fenicsx_tpu.mesh.core import (
        SimplexMesh)

    cache = f"/tmp/bench_mesh_{lc}.npz"
    if os.path.exists(cache):
        d = np.load(cache)
        return SimplexMesh("tetrahedron", d["points"], d["cells"])
    from stabilized_navier_stokes_flow_fenicsx_tpu.config import DEFAULT
    from stabilized_navier_stokes_flow_fenicsx_tpu.flow.channel import (
        generate_channel_mesh)
    from stabilized_navier_stokes_flow_fenicsx_tpu.utils.testimg import (
        make_annulus_image)

    img = "/tmp/bench_circle.png"
    if not os.path.exists(img):
        make_annulus_image(img, "circle")
    mesh, _, _ = generate_channel_mesh(img, lc, DEFAULT, layered=True)
    np.savez(cache, points=np.asarray(mesh.points),
             cells=np.asarray(mesh.cells))
    return mesh


def main():
    lc = float(sys.argv[1]) if len(sys.argv) > 1 else 0.024
    t0 = time.time()
    mesh = get_mesh(lc)
    print(f"mesh: {len(mesh.points)} nodes {mesh.n_cells} cells "
          f"({time.time() - t0:.1f}s)", flush=True)

    from stabilized_navier_stokes_flow_fenicsx_tpu.fem.interpolate import (
        build_trace_locator, recover_extrusion)

    t0 = time.time()
    rec = recover_extrusion(mesh)
    print(f"recover_extrusion: {time.time() - t0:.2f}s "
          f"(n2d={rec[1]}, nt={len(rec[2])})", flush=True)

    pr = cProfile.Profile()
    t0 = time.time()
    pr.enable()
    dloc = build_trace_locator(mesh)
    pr.disable()
    print(f"build_trace_locator: {time.time() - t0:.2f}s", flush=True)
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
    print(s.getvalue())

    # fwd-phase host pieces
    import jax.numpy as jnp

    from stabilized_navier_stokes_flow_fenicsx_tpu.trace.streamtrace import (
        TraceConfigDevice, init_trace_state, pack_u_cells, trace_segment)

    u = np.random.default_rng(0).normal(
        size=(len(mesh.points), 3)).astype(np.float64)
    t0 = time.time()
    u_dev = jnp.asarray(u)
    print(f"u upload: {time.time() - t0:.2f}s", flush=True)
    t0 = time.time()
    u_cell = pack_u_cells(dloc, u_dev.astype(jnp.float32))
    u_cell.block_until_ready()
    print(f"pack_u_cells: {time.time() - t0:.2f}s", flush=True)
    cfg = TraceConfigDevice()
    st = init_trace_state(jnp.zeros((4096, 3), jnp.float32), cfg, dloc,
                          u_cell)
    t0 = time.time()
    st1 = trace_segment(cfg, dloc, u_cell, st, 8)
    st1.x.block_until_ready()
    print(f"trace_segment first (compile): {time.time() - t0:.2f}s",
          flush=True)
    t0 = time.time()
    st1 = trace_segment(cfg, dloc, u_cell, st, 8)
    st1.x.block_until_ready()
    print(f"trace_segment warm: {time.time() - t0:.3f}s", flush=True)


if __name__ == "__main__":
    main()
