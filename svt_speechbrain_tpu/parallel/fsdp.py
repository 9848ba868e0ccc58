"""Fully-sharded data parallelism (ZeRO-3-style) via sharding annotations.

The reference's only parallelism is replicated-parameter data parallelism
(SURVEY.md §2.4). On TPU, fully-sharded variants need no new machinery:
annotate each parameter (and its optimizer moments) as sharded over the
"data" mesh axis and XLA's SPMD partitioner inserts the all-gathers before
use and turns the gradient all-reduce into reduce-scatters — the
scaling-book recipe of "pick a mesh, annotate shardings, let XLA insert
collectives". Per-device parameter + optimizer memory drops by ~the mesh
size, which is what lets a replicated-DP-OOM model train at all.

Each tensor is sharded along its largest axis divisible by the mesh axis
size (ties prefer the later axis — usually the output/feature dim, which
keeps row-major shards contiguous); tensors with no divisible axis (small
biases, scalars) stay replicated, which is also ZeRO's behavior in spirit:
the memory lives in the big matrices.

Composes with tensor parallelism: on a ("data", "model") mesh, apply
``tp.apply_tp`` first and pass its shardings as ``base`` — axes already
taken by TP are respected and FSDP shards a remaining free axis over
"data" (the "hybrid FSDP+TP" layout).
"""
from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def _fsdp_spec(shape, axis_size, axis, base_spec=None):
    """Pick the largest axis divisible by ``axis_size`` that ``base_spec``
    leaves unsharded; P() if none qualifies."""
    taken = tuple(base_spec) if base_spec is not None else (None,) * len(shape)
    taken = tuple(taken) + (None,) * (len(shape) - len(taken))
    best = None
    for i, d in enumerate(shape):
        if taken[i] is not None:
            continue
        if d % axis_size == 0 and d >= axis_size and (
                best is None or d >= shape[best]):
            best = i
    if best is None:
        return P(*taken) if base_spec is not None else P()
    dims = list(taken)
    dims[best] = axis
    return P(*dims)


def fsdp_shardings(params, mesh, axis="data", base=None):
    """NamedSharding pytree sharding every tensor over ``axis``.

    ``base``: optional pytree of NamedSharding (e.g. from
    ``tp.encoder_tp_shardings``) whose already-sharded axes are preserved.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> from svt_speechbrain_tpu.parallel.mesh import make_mesh
    >>> mesh = make_mesh()                  # 1-D "data" mesh, 8 CPU devices
    >>> params = {"w": jnp.ones((16, 8)), "b": jnp.ones((3,))}
    >>> sh = fsdp_shardings(params, mesh, axis="data")
    >>> sh["w"].spec                        # largest divisible axis sharded
    PartitionSpec('data', None)
    >>> sh["b"].spec                        # 3 not divisible by 8: replicated
    PartitionSpec()
    >>> placed = apply_fsdp(params, mesh, axis="data")
    >>> placed["w"].addressable_shards[0].data.shape   # 16/8 rows per device
    (2, 8)
    """
    axis_size = mesh.shape[axis]

    def spec(leaf, base_sh):
        shape = getattr(leaf, "shape", ())
        if len(shape) == 0:
            return NamedSharding(mesh, P())
        base_spec = base_sh.spec if base_sh is not None else None
        return NamedSharding(mesh, _fsdp_spec(shape, axis_size, axis, base_spec))

    if base is None:
        return jax.tree_util.tree_map(
            lambda leaf: spec(leaf, None), params)
    return jax.tree_util.tree_map(spec, params, base)


def apply_fsdp(params, mesh, axis="data", base=None):
    """Place a parameter (or optimizer-state) pytree on the mesh fully
    sharded over ``axis``. XLA all-gathers shards at use inside jit; no
    change to the step function is needed."""
    shardings = fsdp_shardings(params, mesh, axis, base)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
