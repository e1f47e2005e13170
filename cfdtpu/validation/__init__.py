from .ghia import GHIA_U_CENTERLINE

__all__ = ["GHIA_U_CENTERLINE"]
