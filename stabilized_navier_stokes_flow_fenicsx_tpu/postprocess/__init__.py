from .outlet_image import (
    advection_map, outlet_image_from_trace, rasterize_inner_shape)
