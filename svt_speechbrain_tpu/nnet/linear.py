"""Linear transformation (TPU-native analogue of reference ``speechbrain/nnet/linear.py:15``).

The reference ``Linear`` accepts (batch, features), (batch, time, features) or
(batch, time, channel, features) inputs, flattening the trailing pair for 4D.
Here the matmul broadcasts over any leading axes; 4D inputs are combined the
same way when ``combine_dims=True``.
"""
from __future__ import annotations

import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module, kaiming_uniform, uniform_bias, split_rngs


class Linear(Module):
    """y = x @ W + b over the trailing feature axis.

    Arguments
    ---------
    n_neurons : int
        Output dimensionality.
    input_size : int
        Input dimensionality.
    bias : bool
        Whether to add a learned bias.
    combine_dims : bool
        If True and input is 4D, combine the last two axes before the matmul
        (reference ``linear.py:60-66``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> lin = Linear(n_neurons=4, input_size=8)
    >>> params = lin.init(jax.random.PRNGKey(0))
    >>> lin(params, jnp.ones((2, 3, 8))).shape
    (2, 3, 4)
    """

    def __init__(self, n_neurons, input_size, bias=True, combine_dims=False):
        self.n_neurons = n_neurons
        self.input_size = input_size
        self.bias = bias
        self.combine_dims = combine_dims

    def init(self, rng):
        wkey, bkey = split_rngs(rng, 2)
        params = {
            # stored (in, out) so the hot matmul is x @ W with no transpose
            "w": kaiming_uniform(wkey, (self.input_size, self.n_neurons), fan_in=self.input_size)
        }
        if self.bias:
            params["b"] = uniform_bias(bkey, (self.n_neurons,), fan_in=self.input_size)
        return params

    def __call__(self, params, x):
        if x.ndim == 4 and self.combine_dims:
            x = x.reshape(x.shape[0], x.shape[1], x.shape[2] * x.shape[3])
        if "w_q8" in params:  # int8 serving path (models/quantize.py)
            from svt_speechbrain_tpu.ops.quant import int8_matmul

            y = int8_matmul(x, params["w_q8"], params["w_scale"])
        else:
            y = jnp.matmul(x, params["w"], preferred_element_type=x.dtype)
        if self.bias:
            y = y + params["b"]
        return y


class LinearWithConstraint(Linear):
    """Linear with a max-norm weight constraint applied at call time
    (reference ``linear.py:80``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> lin = LinearWithConstraint(2, 4, max_norm=0.5)
    >>> params = {"w": jnp.ones((4, 2)), "b": jnp.zeros((2,))}
    >>> out = lin(params, jnp.ones((1, 4)))       # column norm 2 -> 0.5
    >>> [round(float(v), 4) for v in out[0]]
    [1.0, 1.0]
    """

    def __init__(self, *args, max_norm=1.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.max_norm = max_norm

    def __call__(self, params, x):
        w = params["w"]
        norm = jnp.sqrt(jnp.sum(jnp.square(w), axis=0, keepdims=True))
        scale = jnp.minimum(1.0, self.max_norm / jnp.maximum(norm, 1e-12))
        params = dict(params, w=w * scale)
        return super().__call__(params, x)
