from .facets import FacetQuadrature

__all__ = ["FacetQuadrature"]
