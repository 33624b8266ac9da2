from .poisson import make_poisson_kernel
from .stokes import make_stokes_kernel
from .navier_stokes import make_ns_sups_kernel, make_ns_ugn_kernel
