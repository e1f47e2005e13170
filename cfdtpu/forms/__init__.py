from .navier_stokes import StabilizedNSForm

__all__ = ["StabilizedNSForm"]
