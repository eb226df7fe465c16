from .sharding import (
    ROWS_AXIS,
    THETA_AXIS,
    default_mesh_shape,
    make_mesh,
)
from . import multihost

__all__ = [
    "ROWS_AXIS",
    "THETA_AXIS",
    "default_mesh_shape",
    "make_mesh",
    "multihost",
]
