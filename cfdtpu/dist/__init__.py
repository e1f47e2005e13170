from .partition import ShardedNSForm, make_device_mesh

__all__ = ["ShardedNSForm", "make_device_mesh"]
