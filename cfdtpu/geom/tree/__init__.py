from .tree_2d import VascularTree2D
from .gxl import parse_gxl
from .tree_model import VascularTree

__all__ = ["VascularTree2D", "parse_gxl", "VascularTree"]
