from .unionfind import connected_components
from .ann import AnnIndexActor

__all__ = ["connected_components", "AnnIndexActor"]
