from .probes import eval_at_points

__all__ = ["eval_at_points"]
