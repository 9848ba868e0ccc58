"""Functional module base for the TPU-native nnet library.

Unlike the reference's ``torch.nn.Module`` layers (which hold tensors), these
modules are *descriptions*: hyperparameters on the object, parameters as
explicit pytrees. This is what makes every model in the framework directly
usable under ``jax.jit`` / ``jax.grad`` / ``pjit`` without wrapping.

Conventions
-----------
- ``init(rng) -> params``: a (possibly nested) dict of ``jnp.ndarray``.
- ``__call__(params, *args, **kwargs)``: pure function of its inputs.
- Modules that need randomness at apply time (dropout, masking) take an
  explicit ``rng`` keyword; modules with train/eval behaviour take ``train``.
- Modules with running statistics (batch norm) return ``(out, new_state)``
  when ``train=True``; state lives in ``params['stats']`` style subtrees
  managed by the caller.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class Module:
    """Base class for functional modules.

    Subclasses implement ``init`` and ``__call__``. The base class only
    provides naming/help conveniences; there is no parameter registry —
    parameters are whatever ``init`` returns.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> class Scale(Module):
    ...     def init(self, rng):
    ...         return {"g": jnp.ones(())}
    ...     def __call__(self, params, x):
    ...         return params["g"] * x
    >>> mod = Scale()
    >>> params = mod.init(jax.random.PRNGKey(0))
    >>> float(mod(params, jnp.asarray(3.0)))
    3.0
    >>> count_params(params)
    1
    """

    def init(self, rng):
        """Create this module's parameter pytree. Default: no parameters."""
        del rng
        return {}

    def __call__(self, params, *args, **kwargs):
        raise NotImplementedError

    def __repr__(self):
        fields = ", ".join(
            f"{k}={v!r}" for k, v in vars(self).items() if not k.startswith("_")
        )
        return f"{type(self).__name__}({fields})"


def split_rngs(rng, n):
    """Split an rng key into ``n`` keys (list)."""
    return list(jax.random.split(rng, n))


def glorot_uniform(rng, shape, dtype=jnp.float32, in_axis=-2, out_axis=-1):
    """Glorot/Xavier-uniform init (matches ``torch.nn.init.xavier_uniform_``)."""
    fan_in = shape[in_axis]
    fan_out = shape[out_axis]
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(rng, shape, dtype, -limit, limit)


def kaiming_uniform(rng, shape, dtype=jnp.float32, fan_in=None, a=np.sqrt(5.0)):
    """Kaiming-uniform, the default init of ``torch.nn.Linear``/``Conv*d``.

    ``fan_in`` defaults to the product of all but the last axis for 2D weights;
    conv callers pass it explicitly.
    """
    if fan_in is None:
        fan_in = int(np.prod(shape[:-1]))
    gain = np.sqrt(2.0 / (1.0 + a * a))
    bound = float(gain * np.sqrt(3.0 / fan_in))
    return jax.random.uniform(rng, shape, dtype, -bound, bound)


def uniform_bias(rng, shape, fan_in, dtype=jnp.float32):
    """torch-style bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = float(1.0 / np.sqrt(fan_in)) if fan_in > 0 else 0.0
    return jax.random.uniform(rng, shape, dtype, -bound, bound)


def normal_init(rng, shape, stddev=0.02, dtype=jnp.float32):
    return jax.random.normal(rng, shape, dtype) * stddev


def count_params(params) -> int:
    """Total number of scalars in a parameter pytree."""
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
