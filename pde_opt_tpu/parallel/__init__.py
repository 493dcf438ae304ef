"""Multi-device scale-out: meshes, sharded env fleets, halo exchange."""

from .mesh import make_mesh, env_sharding, replicated_sharding, shard_map, init_distributed
from . import halo
from .sharded_env import ShardedVectorPDEEnv

__all__ = ["make_mesh", "env_sharding", "replicated_sharding", "shard_map", "init_distributed", "halo", "ShardedVectorPDEEnv"]
