from .space import FunctionSpace
from .dirichlet import DirichletBC, BoundaryCondition

__all__ = ["FunctionSpace", "DirichletBC", "BoundaryCondition"]
