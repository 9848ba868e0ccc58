"""Normalization modules (analogue of reference ``speechbrain/nnet/normalization.py``).

All modules are channel-last: inputs are (batch, time, channels) or
(batch, ..., channels), which is both the reference's convention
(``normalization.py:11-430``) and the layout XLA prefers on TPU (trailing
128-lane axis = features).

BatchNorm keeps running statistics as an explicit ``state`` pytree which the
caller threads: ``y, new_state = bn(params, state, x, train=True)``. Under a
data-parallel mesh, pass ``axis_name`` to average batch statistics across
replicas — the TPU-native analogue of the reference's
``SyncBatchNorm.convert_sync_batchnorm`` (``core.py:1157``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module


class LayerNorm(Module):
    """Layer normalization over the trailing ``normalized_shape`` axes
    (reference ``normalization.py:171``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> ln = LayerNorm(input_size=4)
    >>> params = ln.init(jax.random.PRNGKey(0))
    >>> y = ln(params, jnp.asarray([[1.0, 2.0, 3.0, 4.0]]))
    >>> round(float(y.mean()), 6), round(float(y.std()), 4)
    (0.0, 1.0)
    """

    def __init__(self, input_size=None, eps=1e-05, elementwise_affine=True):
        self.input_size = input_size
        self.eps = eps
        self.elementwise_affine = elementwise_affine

    def init(self, rng):
        del rng
        if not self.elementwise_affine:
            return {}
        return {
            "scale": jnp.ones((self.input_size,), jnp.float32),
            "bias": jnp.zeros((self.input_size,), jnp.float32),
        }

    def __call__(self, params, x):
        return layer_norm(
            x,
            params.get("scale") if self.elementwise_affine else None,
            params.get("bias") if self.elementwise_affine else None,
            eps=self.eps,
        )


def layer_norm(x, scale=None, bias=None, eps=1e-05, axis=-1):
    """Functional layer norm over ``axis`` (compute in f32 for bf16 inputs)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=axis, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=axis, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale
    if bias is not None:
        y = y + bias
    return y.astype(dtype)


def global_layer_norm(x, eps=1e-05, row_mask=None):
    """Normalize over *all* elements of ``x`` (no affine). This replicates the
    reference's ``F.layer_norm(wav, wav.shape)`` input/output normalization in
    the HF SSL bridge (``MIR_ST500/huggingface_interface.py:288,296``).

    ``row_mask`` (B,) with 1 for real batch rows excludes device-padding rows
    from the statistics (the engine pads the batch axis to the mesh size);
    with all-ones it is bit-identical to the unmasked version.
    """
    x32 = x.astype(jnp.float32)
    if row_mask is None:
        mean = jnp.mean(x32)
        var = jnp.mean(jnp.square(x32 - mean))
    else:
        m = row_mask.astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 1))
        count = jnp.sum(m) * (x32.size / x32.shape[0])
        mean = jnp.sum(x32 * m) / count
        var = jnp.sum(jnp.square(x32 - mean) * m) / count
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def masked_global_layer_norm(x, elem_mask, eps=1e-05):
    """Whole-tensor layer norm with statistics over ``elem_mask`` positions
    only (mask broadcastable to x). With the mask covering exactly the
    unpadded content, this equals ``global_layer_norm`` on the unpadded
    tensor — the exact-lengths eval path."""
    x32 = x.astype(jnp.float32)
    m = elem_mask.astype(jnp.float32)
    while m.ndim < x32.ndim:
        m = m[..., None]
    m_full = jnp.broadcast_to(m, x32.shape)
    count = jnp.maximum(jnp.sum(m_full), 1.0)
    mean = jnp.sum(x32 * m_full) / count
    var = jnp.sum(jnp.square(x32 - mean) * m_full) / count
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def per_item_layer_norm(x, eps=1e-05):
    """Normalize each batch row over all of its elements — equivalent to the
    reference's ``F.layer_norm(x, x.shape)`` at batch size 1 (its eval
    regime), and the only batching-invariant choice for the batched
    inference pipeline."""
    x32 = x.astype(jnp.float32)
    axes = tuple(range(1, x.ndim))
    mean = jnp.mean(x32, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=axes, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class GroupNorm(Module):
    """Group normalization (reference ``normalization.py:388``); channel-last."""

    def __init__(self, input_size, num_groups, eps=1e-05, affine=True):
        if input_size % num_groups:
            raise ValueError("input_size must be divisible by num_groups")
        self.input_size = input_size
        self.num_groups = num_groups
        self.eps = eps
        self.affine = affine

    def init(self, rng):
        del rng
        if not self.affine:
            return {}
        return {
            "scale": jnp.ones((self.input_size,), jnp.float32),
            "bias": jnp.zeros((self.input_size,), jnp.float32),
        }

    def __call__(self, params, x):
        # x: (batch, ..., channels); groups split the channel axis.
        dtype = x.dtype
        b = x.shape[0]
        spatial = x.shape[1:-1]
        g = self.num_groups
        x32 = x.astype(jnp.float32).reshape(b, -1, g, self.input_size // g)
        # normalize over everything but (batch, group)
        mean = jnp.mean(x32, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=(1, 3), keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        y = y.reshape(b, *spatial, self.input_size)
        if self.affine:
            y = y * params["scale"] + params["bias"]
        return y.astype(dtype)


class _BatchNorm(Module):
    """Shared batch-norm machinery (torch semantics: biased var to normalize,
    unbiased var into the running estimate, momentum=0.1)."""

    def __init__(self, input_size, eps=1e-05, momentum=0.1, affine=True):
        self.input_size = input_size
        self.eps = eps
        self.momentum = momentum
        self.affine = affine

    def init(self, rng):
        del rng
        params = {}
        if self.affine:
            params["scale"] = jnp.ones((self.input_size,), jnp.float32)
            params["bias"] = jnp.zeros((self.input_size,), jnp.float32)
        return params

    def init_state(self):
        return {
            "mean": jnp.zeros((self.input_size,), jnp.float32),
            "var": jnp.ones((self.input_size,), jnp.float32),
        }

    def __call__(self, params, state, x, train=False, axis_name=None):
        """x: (batch, ..., channels). Returns (y, new_state)."""
        dtype = x.dtype
        x32 = x.astype(jnp.float32)
        reduce_axes = tuple(range(x.ndim - 1))
        if train:
            mean = jnp.mean(x32, axis=reduce_axes)
            mean_sq = jnp.mean(jnp.square(x32), axis=reduce_axes)
            if axis_name is not None:  # cross-replica (SyncBN analogue)
                mean = jax.lax.pmean(mean, axis_name)
                mean_sq = jax.lax.pmean(mean_sq, axis_name)
            var = mean_sq - jnp.square(mean)
            n = x32.size // x32.shape[-1]
            if axis_name is not None:
                n = n * jax.lax.psum(1, axis_name)
            unbiased = var * (n / max(n - 1, 1))
            m = self.momentum
            new_state = {
                "mean": (1 - m) * state["mean"] + m * mean,
                "var": (1 - m) * state["var"] + m * unbiased,
            }
        else:
            mean, var = state["mean"], state["var"]
            new_state = state
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            y = y * params["scale"] + params["bias"]
        return y.astype(dtype), new_state


class BatchNorm1d(_BatchNorm):
    """BatchNorm over (batch, time, channels) inputs (reference ``normalization.py:11``).

    Stateful: ``init_state()`` holds the running mean/var, and the call
    returns ``(y, new_state)``.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> bn = BatchNorm1d(input_size=3)
    >>> params, state = bn.init(jax.random.PRNGKey(0)), bn.init_state()
    >>> x = jnp.arange(24, dtype=jnp.float32).reshape(2, 4, 3)
    >>> y, state = bn(params, state, x, train=True)
    >>> y.shape, [round(float(m), 2) for m in state["mean"]]
    ((2, 4, 3), [1.05, 1.15, 1.25])
    """


class BatchNorm2d(_BatchNorm):
    """BatchNorm over (batch, H, W, channels) inputs (reference ``normalization.py:107``)."""


class BatchNorm3d(_BatchNorm):
    """BatchNorm over (batch, T, H, W, channels) inputs — used by the Conv3D
    visual frontend (reference ``N20EMv2/video_only/resnet.py:139-143``)."""


class InstanceNorm1d(Module):
    """Instance norm over the time axis per (batch, channel)
    (reference ``normalization.py:312``)."""

    def __init__(self, input_size, eps=1e-05, affine=False):
        self.input_size = input_size
        self.eps = eps
        self.affine = affine

    def init(self, rng):
        del rng
        if not self.affine:
            return {}
        return {
            "scale": jnp.ones((self.input_size,), jnp.float32),
            "bias": jnp.zeros((self.input_size,), jnp.float32),
        }

    def __call__(self, params, x):
        # x: (batch, time, channels); normalize over time only.
        return layer_norm(
            x.swapaxes(1, -1), params.get("scale"), params.get("bias"), eps=self.eps
        ).swapaxes(1, -1) if self.affine else layer_norm(
            x.swapaxes(1, -1), None, None, eps=self.eps
        ).swapaxes(1, -1)


class InstanceNorm2d(Module):
    """Instance norm over (time, freq) per (batch, channel) for 4-D
    (B, T, F, C) inputs (reference ``normalization.py:382``)."""

    def __init__(self, input_size, eps=1e-05, affine=False):
        self.input_size = input_size
        self.eps = eps
        self.affine = affine

    def init(self, rng):
        del rng
        if not self.affine:
            return {}
        return {"scale": jnp.ones((self.input_size,), jnp.float32),
                "bias": jnp.zeros((self.input_size,), jnp.float32)}

    def __call__(self, params, x):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            y = y * params["scale"] + params["bias"]
        return y.astype(x.dtype)
