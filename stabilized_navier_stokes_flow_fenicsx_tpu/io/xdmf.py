"""XDMF + HDF5 solution I/O (ParaView-compatible).

Replaces ``dolfinx.io.XDMFFile`` writes (reference
NavierStokes/NavierStokesChannelFlow.py:316-346: two files per run,
functions named "Pressure"/"Velocity") and the h5py + adios4dolfinx
re-read path (reference streamtrace.py:58-130).  The HDF5 layout keeps the
reference reader's ``Function/<name>/0`` dataset path, so the solution
files double as checkpoints: solve and streamtrace can run as separate
jobs exactly like the reference (streamtrace.py:667-690).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..mesh.core import SimplexMesh

_TOPOLOGY_TYPE = {"triangle": "Triangle", "tetrahedron": "Tetrahedron"}

_XDMF_TEMPLATE = """<?xml version="1.0"?>
<!DOCTYPE Xdmf SYSTEM "Xdmf.dtd" []>
<Xdmf Version="3.0" xmlns:xi="https://www.w3.org/2001/XInclude">
  <Domain>
    <Grid Name="mesh" GridType="Uniform">
      <Topology TopologyType="{topo}" NumberOfElements="{nc}" NodesPerElement="{nv}">
        <DataItem Dimensions="{nc} {nv}" NumberType="Int" Format="HDF">{h5}:/Mesh/mesh/topology</DataItem>
      </Topology>
      <Geometry GeometryType="{geom}">
        <DataItem Dimensions="{nn} {gd}" Format="HDF">{h5}:/Mesh/mesh/geometry</DataItem>
      </Geometry>
      <Attribute Name="{name}" AttributeType="{atype}" Center="Node">
        <DataItem Dimensions="{nn} {vs}" Format="HDF">{h5}:/Function/{name}/0</DataItem>
      </Attribute>
    </Grid>
  </Domain>
</Xdmf>
"""


def write_xdmf_function(
    basename: str,
    mesh: SimplexMesh,
    values: np.ndarray,
    name: str,
) -> str:
    """Write <basename>.xdmf + <basename>.h5 with one nodal function."""
    import os

    import h5py

    values = np.asarray(values, dtype=np.float64)
    if values.ndim == 1:
        values = values[:, None]
    vs = values.shape[1]
    h5name = basename + ".h5"
    with h5py.File(h5name, "w") as f:
        f.create_dataset("Mesh/mesh/topology",
                         data=mesh.cells.astype(np.int64))
        f.create_dataset("Mesh/mesh/geometry", data=mesh.points)
        f.create_dataset(f"Function/{name}/0", data=values)
    xml = _XDMF_TEMPLATE.format(
        topo=_TOPOLOGY_TYPE[mesh.cell],
        nc=mesh.n_cells,
        nv=mesh.cells.shape[1],
        nn=mesh.n_nodes,
        gd=mesh.gdim,
        geom="XYZ" if mesh.gdim == 3 else "XY",
        name=name,
        atype="Vector" if vs > 1 else "Scalar",
        vs=vs,
        h5=os.path.basename(h5name),
    )
    with open(basename + ".xdmf", "w") as f:
        f.write(xml)
    return basename + ".xdmf"


def read_xdmf_function(basename: str, name: str
                       ) -> Tuple[SimplexMesh, np.ndarray]:
    """Read (mesh, nodal values) back — the reference's
    read_mesh_and_function (streamtrace.py:58-130), minus the MPI
    redistribution dance (single address space)."""
    import h5py

    with h5py.File(basename + ".h5", "r") as f:
        topo = np.asarray(f["Mesh/mesh/topology"])
        geom = np.asarray(f["Mesh/mesh/geometry"])
        vals = np.asarray(f[f"Function/{name}/0"])
    cell = "tetrahedron" if topo.shape[1] == 4 else "triangle"
    mesh = SimplexMesh(cell, geom, topo.astype(np.int32))
    if vals.shape[1] == 1:
        vals = vals[:, 0]
    return mesh, vals
