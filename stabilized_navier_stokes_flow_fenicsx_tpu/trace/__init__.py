from .streamtrace import trace_particles, TraceConfigDevice
from .alpha_shape import alpha_shape_polygon
