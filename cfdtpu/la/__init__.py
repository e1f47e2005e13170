from .gmres import fgmres
from .newton import newton_solve, NewtonParams

__all__ = ["fgmres", "newton_solve", "NewtonParams"]
