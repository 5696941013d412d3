from .mesh import batch_sharding, global_batch, make_mesh, replicate, replicated, shard_batch

__all__ = ['batch_sharding', 'global_batch', 'make_mesh', 'replicate',
           'replicated', 'shard_batch']
