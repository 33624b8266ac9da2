"""Host-side profile of the bench trace+IO phase (no TPU needed).

Times each non-device component of ``bench.run_trace_io`` at the
1.05M-dof bench mesh: XDMF write, XDMF re-read (mesh reconstruction),
trace-locator build (recover_extrusion + hashes), contour re-derivation.
The device trace itself is excluded — it is measured on TPU by bench.py.

Run: JAX_PLATFORMS=cpu python benchmarks/_trace_io_prof.py [lc]
"""
import os
import shutil
import sys
import tempfile
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stabilized_navier_stokes_flow_fenicsx_tpu.config import DEFAULT
from stabilized_navier_stokes_flow_fenicsx_tpu.flow.channel import (
    generate_channel_mesh)
from stabilized_navier_stokes_flow_fenicsx_tpu.io.xdmf import (
    read_xdmf_function, write_xdmf_function)
from stabilized_navier_stokes_flow_fenicsx_tpu.fem.interpolate import (
    build_trace_locator)
from stabilized_navier_stokes_flow_fenicsx_tpu.trace.pipeline import (
    update_contour)


def main():
    lc = float(sys.argv[1]) if len(sys.argv) > 1 else 0.024
    from stabilized_navier_stokes_flow_fenicsx_tpu.utils.testimg import (
        make_annulus_image)
    img = "/tmp/bench_circle.png"
    if not os.path.exists(img):
        make_annulus_image(img, "circle")
    t0 = time.time()
    mesh, _, _ = generate_channel_mesh(img, lc, DEFAULT, layered=True)
    print(f"mesh build: {time.time()-t0:.1f}s  nv={len(mesh.points)} "
          f"nc={len(mesh.cells)}")

    nv = len(mesh.points)
    u = np.random.default_rng(0).standard_normal((nv, 3))
    p = np.random.default_rng(1).standard_normal((nv,))

    folder = tempfile.mkdtemp(prefix="traceio_prof_")
    try:
        t0 = time.time()
        write_xdmf_function(f"{folder}/V", mesh, u, "Velocity")
        write_xdmf_function(f"{folder}/P", mesh, p, "Pressure")
        print(f"io_write: {time.time()-t0:.2f}s")

        t0 = time.time()
        mesh_r, u_r = read_xdmf_function(f"{folder}/V", "Velocity")
        print(f"io_read:  {time.time()-t0:.2f}s")
    finally:
        shutil.rmtree(folder, ignore_errors=True)

    t0 = time.time()
    contour3 = update_contour(img, DEFAULT)
    print(f"contour:  {time.time()-t0:.2f}s  ({len(contour3)} pts)")

    t0 = time.time()
    dloc = build_trace_locator(mesh_r)
    print(f"locator:  {time.time()-t0:.2f}s  kind={type(dloc).__name__}")

    t0 = time.time()
    u_dev = jax.numpy.asarray(u_r)
    u_dev.block_until_ready()
    print(f"u upload: {time.time()-t0:.2f}s")


if __name__ == "__main__":
    main()
