"""Fused Pallas layered SpMV vs the XLA layered matvec (interpret mode).

The kernel itself targets TPU; on the CPU test mesh it runs through the
Pallas interpreter, which checks the ELL regularization, the lane-roll
plane shifts, and the in-VMEM row reduction bit-for-bit against
assemble/layered.py::layered_matvec.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from stabilized_navier_stokes_flow_fenicsx_tpu.assemble.layered import (
    build_layered, layered_matvec, matrix_values_layered)
from stabilized_navier_stokes_flow_fenicsx_tpu.assemble.pallas_spmv import (
    build_ell, ell_values, layered_matvec_pallas)
from stabilized_navier_stokes_flow_fenicsx_tpu.fem.space import (
    make_mixed_space)
from stabilized_navier_stokes_flow_fenicsx_tpu.forms.navier_stokes import (
    make_ns_sups_kernel)
from stabilized_navier_stokes_flow_fenicsx_tpu.mesh.extrude import (
    extrude_channel)
from stabilized_navier_stokes_flow_fenicsx_tpu.mesh.image import (
    get_contours, load_image, optimize_contour)
from stabilized_navier_stokes_flow_fenicsx_tpu.mesh.tri2d import (
    triangulate_cross_section)
from stabilized_navier_stokes_flow_fenicsx_tpu.utils.testimg import (
    make_annulus_image)


@pytest.fixture(scope="module")
def layered_problem(tmp_path_factory):
    img = str(tmp_path_factory.mktemp("pls") / "c.png")
    make_annulus_image(img, "circle", size=300)
    g = load_image(img)
    cs = get_contours(g)
    co, _ = optimize_contour(cs[0], cutoff=0.15, mesh_lc_frac=0.01)
    ci, _ = optimize_contour(cs[1], cutoff=0.15, mesh_lc_frac=0.01)
    inner = ci[:, [1, 0]]
    tri = triangulate_cross_section(inner, co[:, [1, 0]], lc=0.12)
    mesh = extrude_channel(tri, inner, lc=0.12, compact=False)
    n2d, n_planes, _ = mesh.layered
    W = make_mixed_space(mesh, 1, 1)
    lp = build_layered(W, n2d, n_planes)
    kern = make_ns_sups_kernel("tetrahedron", nu=0.1)
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.normal(size=W.ndofs) * 0.1)
    x = jnp.asarray(rng.normal(size=W.ndofs))
    vals = matrix_values_layered(kern, lp.E, n_planes, lp.bs,
                                 lp.arrays, w)
    return lp, n2d, n_planes, vals, x


def test_pallas_spmv_matches_layered(layered_problem):
    lp, n2d, n_planes, vals, x = layered_problem
    y_ref = np.asarray(
        layered_matvec(lp.arrays, n2d, n_planes, vals, x))

    ell = build_ell(lp.arrays, n2d, n_planes)
    v_ell = ell_values(ell, vals)
    y = np.asarray(layered_matvec_pallas(ell, v_ell, x, lp.bs,
                                         interpret=True))
    # kernel computes in f32 (TPU target); reference is f64 on CPU
    np.testing.assert_allclose(y, y_ref.astype(y.dtype), rtol=0,
                               atol=1e-5 * np.abs(y_ref).max())


def test_pallas_spmv_bf16_values_close(layered_problem):
    lp, n2d, n_planes, vals, x = layered_problem
    y_ref = np.asarray(
        layered_matvec(lp.arrays, n2d, n_planes, vals, x))

    ell = build_ell(lp.arrays, n2d, n_planes)
    v_ell = ell_values(ell, vals, dtype=jnp.bfloat16)
    y = np.asarray(layered_matvec_pallas(ell, v_ell, x, lp.bs,
                                         interpret=True))
    # bf16 values, f32 accumulation: ~3 decimal digits on the values
    err = np.abs(y - y_ref) / max(1e-30, np.abs(y_ref).max())
    assert err.max() < 2e-2, err.max()
