"""TPU-native stabilized finite-element Navier-Stokes framework.

A from-scratch re-design (JAX/XLA/Pallas/pjit) of the capabilities of the
reference application ``mungerct/Stabilized_Navier_Stokes_Flow_FEniCSx``:
image-defined co-extrusion channel flow solved with stabilized P1-P1 /
Taylor-Hood finite elements, Newton/Krylov solvers, and vmapped RK45
streamtracing — all device-resident.

Layers (bottom-up), mirroring SURVEY.md section 7:

- ``fem``       element tables, function spaces, dofmaps, boundary conditions
- ``mesh``      image->contour pipeline, native 2D/3D meshers, device mesh arrays
- ``forms``     element residual kernels (Poisson / stabilized Stokes / SUPS NS)
- ``assemble``  vmapped element kernels + segment-sum scatter, BCSR matrices
- ``solve``     Krylov (FGMRES/BiCGStab/TFQMR), Newton (SNES-equivalent), direct
- ``trace``     vmapped RK45 forward/reverse streamtracing with events
- ``io``        XDMF/HDF5 output, run manifests
- ``parallel``  shard_map element sharding over jax.sharding.Mesh
- ``apps``      CLI entry points with the reference's argv contracts
"""

__version__ = "0.1.0"

import jax as _jax

# FEM assembly is accuracy-critical: TPU matmul/einsum/dot default to
# single-pass bf16 inputs, which puts an ABSOLUTE noise floor ~1e-1 on
# assembled Newton residuals at 345k dofs (round-2 misattributed this to
# "the f32 floor": the same f32 step on CPU reaches 5.9e-6).  Forcing
# f32 MACs restores CPU-identical residuals on TPU at no measured
# wall-clock cost (the hot path is HBM-bound SpMV/segment-sum, not MXU
# matmuls; measured 41.8s -> 40.8s per probe step at 26k dofs).
_jax.config.update("jax_default_matmul_precision", "float32")

from . import config as config
