from .mesh import Mesh
from .structured import (
    create_unit_square,
    create_rectangle,
    create_unit_cube,
    create_box,
)

__all__ = [
    "Mesh",
    "create_unit_square",
    "create_rectangle",
    "create_unit_cube",
    "create_box",
]
