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

from . import config as config
