from .assembly import (
    Assembler,
    BlockPattern,
    affine_geometry,
    build_pattern,
)
