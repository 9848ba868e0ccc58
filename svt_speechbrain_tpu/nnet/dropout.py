"""Dropout (analogue of reference ``speechbrain/nnet/dropout.py``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module


def dropout(x, rate, rng=None, train=False):
    """Standard inverted dropout. No-op when ``train`` is False, ``rng`` is None
    or ``rate == 0`` — so the eval path stays fully deterministic and
    jit-cacheable without rng plumbing.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> x = jnp.ones((2, 8))
    >>> bool(jnp.all(dropout(x, 0.5) == x))           # eval: identity
    True
    >>> y = dropout(x, 0.5, rng=jax.random.PRNGKey(0), train=True)
    >>> sorted(set(float(v) for v in y.ravel()))      # dropped or scaled
    [0.0, 2.0]
    """
    if not train or rng is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class Dropout2d(Module):
    """Channel dropout over (batch, time, channels) inputs
    (reference ``dropout.py:14``): zeroes whole channels."""

    def __init__(self, drop_rate):
        self.drop_rate = drop_rate

    def __call__(self, params, x, rng=None, train=False):
        del params
        if not train or rng is None or self.drop_rate <= 0.0:
            return x
        keep = 1.0 - self.drop_rate
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],))
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
