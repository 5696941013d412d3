"""Device mesh + sharding helpers.

The reference's only parallelism is DDP over NCCL (SURVEY.md §2.5;
/root/reference/train.py:65-67). The TPU-native equivalent is SPMD data
parallelism: a 1-D ('data',) mesh, batch sharded over it, parameters
replicated; XLA inserts the gradient psum over ICI. The same code runs on a
single chip (trivial mesh) through pod slices — and the mesh helper accepts
extra axes so models that ever need tensor sharding can reuse it.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_names=('data',), shape=None) -> Mesh:
    """Build a mesh over `devices` (default: all). 1-D data mesh by default."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = 'data') -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(batch, mesh: Mesh, axis: str = 'data'):
    """Device-put a host batch (pytree of arrays) sharded on the leading dim."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Device-put a pytree fully replicated over the mesh.

    Multi-process safe: when the mesh spans non-addressable devices,
    jax.device_put cannot place host values, so each process contributes its
    (identical) copy via jax.make_array_from_process_local_data. PRNG key
    arrays round-trip through key_data/wrap_key_data.
    """
    sh = replicated(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), tree)

    def put(x):
        if hasattr(x, 'dtype') and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            data = jax.device_get(jax.random.key_data(x))
            impl = jax.random.key_impl(x)
            g = jax.make_array_from_process_local_data(sh, np.asarray(data))
            return jax.random.wrap_key_data(g, impl=impl)
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree.map(put, tree)


def global_batch(x, mesh: Mesh, axis: str = 'data'):
    """Assemble a global batch-sharded array from this process's local shard.

    Single-process: plain device_put. Multi-process: `x` is this host's
    contiguous slice of the global batch (see DataLoader shard_rank/count);
    jax.make_array_from_process_local_data stitches the global array without
    any cross-host transfer of array data.
    """
    sh = batch_sharding(mesh, axis)
    if jax.process_count() == 1:
        return jax.device_put(x, sh)
    return jax.make_array_from_process_local_data(sh, np.asarray(x))
