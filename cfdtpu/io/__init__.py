from .vtu import VTUSeriesWriter

__all__ = ["VTUSeriesWriter"]
