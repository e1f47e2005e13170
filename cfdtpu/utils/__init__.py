from .geometry import det_and_inv
from .dtypes import resolve_dtype

__all__ = ["det_and_inv", "resolve_dtype"]
