"""Device meshes and shardings — the TPU-native replacement for the
reference's DataParallel/DDP layer (``speechbrain/core.py:1150-1169``,
``speechbrain/utils/distributed.py``).

Strategy map (SURVEY.md §2.4):

- torch ``nn.DataParallel``/DDP (pure data parallelism) → a 1-D ``Mesh``
  over all devices with the batch axis sharded (``NamedSharding(P("data"))``)
  and parameters replicated. XLA inserts the gradient ``psum`` over ICI —
  the allreduce the reference got from NCCL inside ``loss.backward()``.
- Tensor parallelism is available for free by adding a "model" mesh axis and
  sharding weight matrices — exposed here but not required for parity.

All helpers work on any device set (real TPUs or the CPU-simulated 8-device
mesh used in tests via ``xla_force_host_platform_device_count``).
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis_names=("data",), shape=None, devices=None):
    """Create a Mesh over the first ``n_devices`` devices.

    ``shape`` gives a multi-axis mesh, e.g. ``shape=(4, 2)`` with
    ``axis_names=("data", "model")``.

    Example
    -------
    >>> import jax, numpy as np
    >>> mesh = make_mesh()                      # all devices, 1-D data mesh
    >>> mesh.axis_names, mesh.devices.size == jax.device_count()
    (('data',), True)
    >>> batch = shard_batch(mesh, np.ones((jax.device_count() * 2, 3)))
    >>> batch.sharding.spec
    PartitionSpec('data', None)
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    devices = np.asarray(devices)
    if shape is None:
        shape = (len(devices),) if len(axis_names) == 1 else None
        if shape is None:
            raise ValueError("Provide shape for multi-axis meshes")
    return Mesh(devices.reshape(shape), axis_names)


def data_parallel_sharding(mesh, ndim=1, axis="data"):
    """NamedSharding that splits axis 0 (batch) over the mesh's data axis."""
    spec = P(axis, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicate(mesh, tree):
    """Fully replicate a pytree across the mesh (parameters, opt state)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh, tree, axis="data", batch_axis=0):
    """Place a host batch on the mesh with ``batch_axis`` sharded over ``axis``.

    In multi-host runs each host feeds its local shard
    (``jax.make_array_from_process_local_data``); single-host runs device_put
    with a sharded layout. Scalars/0-d arrays (and arrays too small to carry
    the batch axis) are replicated.
    """

    def put(x):
        x = np.asarray(x)
        if x.ndim <= batch_axis:
            return jax.device_put(x, NamedSharding(mesh, P()))
        dims = [None] * x.ndim
        dims[batch_axis] = axis
        sharding = NamedSharding(mesh, P(*dims))
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)


def pad_batch_to_multiple(arrays, multiple):
    """Pad axis 0 of every array to a multiple of ``multiple`` (device count)
    so batches shard evenly; returns (padded_tree, real_batch_size)."""

    def pad(x):
        x = np.asarray(x)
        b = x.shape[0]
        target = int(-(-b // multiple) * multiple)
        if target == b:
            return x
        pads = [(0, target - b)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, pads)

    first = jax.tree_util.tree_leaves(arrays)[0]
    return jax.tree_util.tree_map(pad, arrays), np.asarray(first).shape[0]
