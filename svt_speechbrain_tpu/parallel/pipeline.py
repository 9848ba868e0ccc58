"""SPMD pipeline parallelism (GPipe-style) over a mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2.4); this is the
TPU-native formulation for when a model's layer stack doesn't fit one chip:
shard a stack of identically-shaped stages over a "pipe" mesh axis and
rotate microbatch activations through the stages with
``jax.lax.ppermute`` inside ``jax.shard_map`` — the classic SPMD-GPipe
schedule (warmup → steady state → drain), expressed as a ``lax.scan`` over
``M + S - 1`` ticks. At every tick each device runs ITS stage on its
current microbatch and passes the result to the next stage over ICI; with
``M`` microbatches the pipeline bubble is the standard ``(S-1)/(M+S-1)``
fraction.

Composable: the mesh may have other axes (data/model); ``spmd_pipeline``
only requires the activations to be replicated over the pipe axis.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def stack_stage_params(stage_param_list):
    """[stage pytrees] → one pytree with a leading stage axis."""
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *stage_param_list)


def bubble_fraction(m, s):
    """Idle fraction of the GPipe schedule: ``S`` stages, ``M`` microbatches
    run in ``M + S - 1`` ticks of which each device does useful work on
    ``M`` — the bubble is the classic ``(S-1)/(M+S-1)``.

    Example
    -------
    >>> bubble_fraction(4, 2)          # 2 stages, 4 microbatches: 5 ticks
    0.2
    >>> bubble_fraction(1, 8)          # no overlap at all
    0.875
    """
    return (s - 1) / (m + s - 1)


def schedule_ticks(m, s):
    """Number of scan ticks ``spmd_pipeline`` runs (the denominator of
    ``bubble_fraction``); exposed so harnesses can assert the compiled
    schedule matches the analytic bubble model.

    Example
    -------
    >>> schedule_ticks(4, 2)
    5
    """
    return m + s - 1


def spmd_pipeline(stage_fn, stacked_params, x_microbatches, mesh,
                  axis="pipe"):
    """Run ``y = stage_{S-1}(…stage_0(x)…)`` for each microbatch through an
    ``S``-stage pipeline sharded over ``mesh`` axis ``axis``.

    Arguments
    ---------
    stage_fn : callable(params_slice, x) -> y
        One pipeline stage; inputs and outputs must have the same shape
        (e.g. a block of transformer layers).
    stacked_params : pytree
        Per-stage parameters stacked on a leading axis of size S
        (``stack_stage_params``); sharded over ``axis`` here.
    x_microbatches : (M, ...) array
        M microbatches, replicated over the pipe axis.
    mesh : jax.sharding.Mesh with ``axis`` of size S.

    Returns (M, ...) outputs, replicated over ``axis``.

    Example
    -------
    >>> import numpy as np, jax.numpy as jnp
    >>> from svt_speechbrain_tpu.parallel.mesh import make_mesh
    >>> mesh = make_mesh(axis_names=("pipe",), shape=(8,))
    >>> stacked = stack_stage_params(
    ...     [{"w": jnp.full((1,), float(i + 1))} for i in range(8)])
    >>> x = jnp.zeros((8, 4))           # 8 microbatches of shape (4,)
    >>> y = spmd_pipeline(lambda p, x: x + p["w"], stacked, x, mesh,
    ...                   axis="pipe")
    >>> y.shape, np.unique(np.asarray(y))     # each mb passed stages 1..8
    ((8, 4), array([36.], dtype=float32))
    """
    s = mesh.shape[axis]
    m = x_microbatches.shape[0]

    def per_device(params_local, x_local):
        # params_local: stage slice with leading axis 1; x_local: (M, ...)
        params_here = jax.tree_util.tree_map(lambda p: p[0], params_local)
        stage = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % s) for i in range(s)]
        mb_shape = x_local.shape[1:]

        def tick(carry, t):
            state, outputs = carry
            # stage 0 injects microbatch t (clamped; overshoot ticks feed
            # garbage that drains past the collection window)
            inject = x_local[jnp.clip(t, 0, m - 1)]
            cur = jnp.where(stage == 0, inject, state)
            y = stage_fn(params_here, cur)
            # collect on the last stage: its tick-t output is microbatch
            # t-(S-1)
            out_idx = t - (s - 1)
            valid = (stage == s - 1) & (out_idx >= 0)
            idx = jnp.clip(out_idx, 0, m - 1)
            outputs = outputs.at[idx].set(
                jnp.where(valid, y, outputs[idx]))
            state_next = jax.lax.ppermute(y, axis, perm)
            return (state_next, outputs), None

        state0 = jnp.zeros(mb_shape, x_local.dtype)
        outputs0 = jnp.zeros((m,) + mb_shape, x_local.dtype)
        (_, outputs), _ = jax.lax.scan(
            tick, (state0, outputs0), jnp.arange(schedule_ticks(m, s)))
        # outputs live on the last stage (zeros elsewhere) → replicate
        return jax.lax.psum(outputs, axis)

    def spec_for(leaf):
        return P(axis, *([None] * (leaf.ndim - 1)))

    param_specs = jax.tree_util.tree_map(spec_for, stacked_params)
    x_spec = P(*([None] * x_microbatches.ndim))

    stacked_params = jax.tree_util.tree_map(
        lambda leaf, sp: jax.device_put(leaf, NamedSharding(mesh, sp)),
        stacked_params, param_specs)
    fn = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(param_specs, x_spec),
        out_specs=x_spec,
        check_vma=False,
    )
    return fn(stacked_params, x_microbatches)


def pipeline_transformer_layers(layer, stacked_params, x_microbatches, mesh,
                                axis="pipe", **layer_kwargs):
    """Convenience wrapper: pipeline a stack of identical
    ``TransformerLayer``-like modules (``layer(params, x, **kwargs)``)."""
    fn = functools.partial(_call_layer, layer, layer_kwargs)
    return spmd_pipeline(fn, stacked_params, x_microbatches, mesh, axis=axis)


def _call_layer(layer, layer_kwargs, params, x):
    return layer(params, x, **layer_kwargs)
