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
SP_AXIS = "sp"


def make_mesh(n_devices=0):
    """1-D data mesh over the first ``n_devices`` devices (0 = all)."""
    devices = jax.devices()
    if n_devices and n_devices > 0:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def make_mesh_2d(n_data, n_sp):
    """2-D (data, sp) mesh for the GSPMD partitioning mode: batches shard
    along ``data``, image HEIGHT along ``sp`` (XLA inserts the conv halo
    exchanges).  ``sp`` devices are adjacent in the device order so the
    halo traffic rides the fastest ICI links."""
    devices = jax.devices()
    n = n_data * n_sp
    assert n <= len(devices), (
        "mesh %dx%d needs %d devices, have %d" % (n_data, n_sp, n,
                                                  len(devices)))
    return Mesh(np.array(devices[:n]).reshape(n_data, n_sp),
                (DATA_AXIS, SP_AXIS))


def spatial_batch_sharding(mesh):
    """Batch axis over ``data``, height (axis 1) over ``sp`` — for both
    [B,H,W,3] images and [B,H,W] label rasters."""
    return NamedSharding(mesh, P(DATA_AXIS, SP_AXIS))


def batch_sharding(mesh):
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch, sharding=None):
    """Place host batch leaves on the mesh, split along axis 0 (or along
    ``sharding`` when given, e.g. :func:`spatial_batch_sharding`).

    Single-process: a plain device_put with the sharded layout.
    Multi-process (TPU pod, one process per host): each process passes its
    LOCAL shard (global_batch / process_count leading dim) and the leaves are
    assembled into global arrays — the DCN/ICI layout comes from the mesh.
    """
    sharding = batch_sharding(mesh) if sharding is None else sharding
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    def to_global(x):
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(to_global, batch)
