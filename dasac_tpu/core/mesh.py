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
    """Place host numpy batch leaves on the mesh, split along axis 0."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
