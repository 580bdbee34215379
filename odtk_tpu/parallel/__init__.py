"""Parallelism: device meshes, shardings, multi-host bootstrap.

The reference's entire distributed story is synchronous data parallelism
over NCCL (SURVEY.md §2.4). The TPU-native equivalent here: a 1-D
``data`` mesh over all chips, batch sharded on it, parameters
replicated; XLA inserts the gradient psum over ICI. Multi-host extends
the same mesh over DCN via jax.distributed.
"""

from .mesh import (make_mesh, make_mesh_for_batch, batch_sharding,
                   replicated_sharding, shard_batch, host_local_batch_size,
                   host_local_array)
from .dist import init_distributed, world_info, all_gather_host

__all__ = ['make_mesh', 'make_mesh_for_batch', 'batch_sharding',
           'replicated_sharding',
           'shard_batch', 'host_local_batch_size', 'host_local_array',
           'init_distributed', 'world_info', 'all_gather_host']
