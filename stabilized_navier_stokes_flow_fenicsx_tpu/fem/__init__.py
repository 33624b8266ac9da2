from .elements import (
    Element,
    QuadratureRule,
    p1_interval,
    p1_triangle,
    p1_tet,
    p2_triangle,
    p2_tet,
    quadrature,
)
from .space import FunctionSpace, MixedVelocityPressureSpace
from .bc import DirichletBC, combine_bcs
