"""Device mesh + sharding helpers.

The reference's process-per-GPU NCCL world (train.py:489-557, mp.spawn +
DistributedDataParallel) becomes a 1-D data mesh: batches shard along
``data``, parameters replicate, and the in-step collectives (pmean of grads
and BN stats, psum of metrics) ride ICI via XLA (SURVEY.md §2.3).
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices=0):
    """1-D data mesh over the first ``n_devices`` devices (0 = all)."""
    devices = jax.devices()
    if n_devices and n_devices > 0:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh):
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch):
    """Place host batch leaves on the mesh, split along axis 0.

    Single-process: a plain device_put with the sharded layout.
    Multi-process (TPU pod, one process per host): each process passes its
    LOCAL shard (global_batch / process_count leading dim) and the leaves are
    assembled into global arrays — the DCN/ICI layout comes from the mesh.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    def to_global(x):
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(to_global, batch)
