from .geometry import det_and_inv, SortedScatter
from .dtypes import resolve_dtype

__all__ = ["det_and_inv", "SortedScatter", "resolve_dtype"]
