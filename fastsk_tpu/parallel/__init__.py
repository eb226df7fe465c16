from .sharding import (
    ROWS_AXIS,
    THETA_AXIS,
    default_mesh_shape,
    make_mesh,
)

__all__ = ["ROWS_AXIS", "THETA_AXIS", "default_mesh_shape", "make_mesh"]
