from . import distributed
from .mesh import make_mesh, replicate, shard_on

__all__ = ["make_mesh", "replicate", "shard_on", "distributed"]
