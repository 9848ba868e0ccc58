"""Pooling modules (analogue of reference ``speechbrain/nnet/pooling.py``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module


def _reduce_window(x, window, stride, padding, mode, ndim):
    """Pool over ``ndim`` spatial axes of a channel-last tensor."""
    dims = (1,) + tuple(window) + (1,)
    strides = (1,) + tuple(stride) + (1,)
    pads = ((0, 0),) + tuple(padding) + ((0, 0),)
    if mode == "max":
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, dims, strides, pads)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, pads)
    import numpy as np

    return summed / float(np.prod(window))


class Pooling1d(Module):
    """1-D max/avg pooling over (batch, time, channels)
    (reference ``pooling.py:15``).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> pool = Pooling1d("max", kernel_size=2)
    >>> x = jnp.asarray([[[1.0], [4.0], [2.0], [3.0]]])   # (1, 4, 1)
    >>> [float(v) for v in pool({}, x)[0, :, 0]]
    [4.0, 3.0]
    """

    def __init__(self, pool_type, kernel_size, stride=None, padding=0, ceil_mode=False):
        self.pool_type = pool_type
        self.kernel_size = kernel_size
        self.stride = stride or kernel_size
        self.padding = padding
        self.ceil_mode = ceil_mode

    def __call__(self, params, x):
        del params
        return _reduce_window(
            x, (self.kernel_size,), (self.stride,), ((self.padding, self.padding),),
            "max" if self.pool_type == "max" else "avg", 1,
        )


class Pooling2d(Module):
    """2-D pooling over (batch, H, W, C) (reference ``pooling.py:111``)."""

    def __init__(self, pool_type, kernel_size, stride=None, padding=0):
        self.pool_type = pool_type
        ks = kernel_size if isinstance(kernel_size, (tuple, list)) else (kernel_size, kernel_size)
        self.kernel_size = tuple(ks)
        st = stride or ks
        self.stride = tuple(st) if isinstance(st, (tuple, list)) else (st, st)
        pd = padding if isinstance(padding, (tuple, list)) else (padding, padding)
        self.padding = tuple(pd)

    def __call__(self, params, x):
        del params
        return _reduce_window(
            x, self.kernel_size, self.stride,
            tuple((p, p) for p in self.padding),
            "max" if self.pool_type == "max" else "avg", 2,
        )


class StatisticsPooling(Module):
    """Mean(+std) pooling over time (reference ``pooling.py:198``), used by
    speaker-embedding models (x-vector/ECAPA).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> sp = StatisticsPooling()
    >>> x = jnp.asarray([[[1.0], [3.0]]])                 # (1, 2, 1)
    >>> out = sp({}, x)                                   # [mean, std]
    >>> [round(float(v), 3) for v in out[0]]
    [2.0, 1.414]
    """

    def __init__(self, return_mean=True, return_std=True, eps=1e-5):
        self.return_mean = return_mean
        self.return_std = return_std
        self.eps = eps

    def __call__(self, params, x, lengths=None):
        del params
        if lengths is None:
            mean = jnp.mean(x, axis=1)
            # torch.std default: unbiased (n-1), which the reference uses
            std = jnp.std(x, axis=1, ddof=1)
        else:
            t = x.shape[1]
            n = jnp.clip(jnp.round(lengths * t), 1, t)[:, None]
            mask = (jnp.arange(t)[None, :, None] < n[..., None]).astype(x.dtype)
            mean = jnp.sum(x * mask, axis=1) / n
            var = (jnp.sum(jnp.square(x - mean[:, None]) * mask, axis=1)
                   / jnp.maximum(n - 1, 1))
            std = jnp.sqrt(var + self.eps)
        outs = []
        if self.return_mean:
            outs.append(mean)
        if self.return_std:
            outs.append(std)
        return jnp.concatenate(outs, axis=-1)


class AdaptiveAvgPool2d(Module):
    """Adaptive average pool to a fixed output (torch ``AdaptiveAvgPool2d``
    analogue; output (1,1) is the ResNet trunk's global pool,
    reference ``N20EMv2/video_only/resnet.py:124-131``)."""

    def __init__(self, output_size=(1, 1)):
        self.output_size = output_size

    def __call__(self, params, x):
        del params
        if self.output_size != (1, 1):
            raise NotImplementedError("only global (1,1) pooling is supported")
        return jnp.mean(x, axis=(1, 2), keepdims=True)


class AdaptivePool(Module):
    """Adaptive average pooling to a fixed output size over time (and
    frequency for 4-D inputs), reference ``pooling.py:329``. Matches torch's
    AdaptiveAvgPool bucketing: bucket ``i`` averages input positions
    ``[floor(i*n/out), ceil((i+1)*n/out))``."""

    def __init__(self, output_size):
        self.output_size = output_size

    @staticmethod
    def _pool_axis(x, out, axis):
        n = x.shape[axis]
        xs = jnp.moveaxis(x, axis, 0)
        rows = []
        for i in range(out):
            lo = (i * n) // out
            hi = -(-((i + 1) * n) // out)
            rows.append(jnp.mean(xs[lo:hi], axis=0))
        return jnp.moveaxis(jnp.stack(rows, axis=0), 0, axis)

    def __call__(self, params, x):
        del params
        size = self.output_size
        if isinstance(size, int):
            return self._pool_axis(x, size, 1)  # (B, T, C): pool time
        y = self._pool_axis(x, size[0], 1)
        return self._pool_axis(y, size[1], 2)
