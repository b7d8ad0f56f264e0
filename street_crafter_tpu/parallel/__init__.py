from .mesh import MeshSpec, make_mesh, make_virtual_cpu_mesh, axis_size
from .sharding import (
    ShardingRules, named_sharding, replicated, shard_batch, shard_pytree_batch,
    with_sharding_constraint,
)

__all__ = [
    "MeshSpec", "make_mesh", "make_virtual_cpu_mesh", "axis_size",
    "ShardingRules", "named_sharding", "replicated", "shard_batch",
    "shard_pytree_batch", "with_sharding_constraint",
]
