from .core import SimplexMesh, boundary_facets, facets_of_cells
from .structured import unit_square_tri, box_tet, unit_interval
