from .kernel_shard import (active_kernel_sharding, kernel_sharding,
                           wrap_kernel)
from .mesh import MeshSpec, make_mesh, make_virtual_cpu_mesh, axis_size
from .sample import sample_on_mesh, shard_window_inputs
from .sharding import (
    ShardingRules, named_sharding, replicated, shard_batch, shard_pytree_batch,
    with_sharding_constraint,
)

__all__ = [
    "active_kernel_sharding", "kernel_sharding", "wrap_kernel",
    "MeshSpec", "make_mesh", "make_virtual_cpu_mesh", "axis_size",
    "sample_on_mesh", "shard_window_inputs",
    "ShardingRules", "named_sharding", "replicated", "shard_batch",
    "shard_pytree_batch", "with_sharding_constraint",
]
