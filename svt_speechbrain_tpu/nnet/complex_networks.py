"""Complex-valued neural networks (analogue of reference
``speechbrain/nnet/complex_networks/`` ~2.8k LoC).

Representation convention follows the reference: a complex tensor of width
2N is stored as ``[real_0..real_{N-1}, imag_0..imag_{N-1}]`` along the last
axis. Ops implement the complex product

    (a + ib)(c + id) = (ac - bd) + i(ad + bc)

as two real MXU matmuls over stacked weight matrices.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module, split_rngs


def check_complex_input(input_shape):
    if input_shape[-1] % 2:
        raise ValueError("Complex tensors must have an even last dimension")


def get_real(x):
    return x[..., : x.shape[-1] // 2]


def get_imag(x):
    return x[..., x.shape[-1] // 2:]


def complex_init(rng, in_features, out_features, criterion="glorot"):
    """Unitary-ish complex init (reference ``c_ops.py`` complex_init):
    modulus ~ Rayleigh(s), phase ~ U(-pi, pi)."""
    if criterion == "glorot":
        s = 1.0 / np.sqrt(2.0 * (in_features + out_features))
    else:
        s = 1.0 / np.sqrt(2.0 * in_features)
    k1, k2 = jax.random.split(rng)
    modulus = s * jnp.sqrt(-2.0 * jnp.log(
        jax.random.uniform(k1, (in_features, out_features), minval=1e-7, maxval=1.0)))
    phase = jax.random.uniform(k2, (in_features, out_features),
                               minval=-np.pi, maxval=np.pi)
    return modulus * jnp.cos(phase), modulus * jnp.sin(phase)


def complex_linear_op(x, real_weight, imag_weight, bias=None):
    """Complex matmul over the packed representation
    (reference ``c_ops.py`` complex_linear_op)."""
    xr, xi = get_real(x), get_imag(x)
    yr = xr @ real_weight - xi @ imag_weight
    yi = xr @ imag_weight + xi @ real_weight
    y = jnp.concatenate([yr, yi], axis=-1)
    if bias is not None:
        y = y + bias
    return y


class CLinear(Module):
    """Complex linear layer (reference ``complex_networks/linear.py``).
    ``n_neurons`` counts complex units (output width = 2*n_neurons)."""

    def __init__(self, n_neurons, input_shape=None, input_size=None, bias=True,
                 init_criterion="glorot", weight_init="complex"):
        if input_size is None and input_shape is not None:
            input_size = input_shape[-1]
        check_complex_input((input_size,))
        self.in_complex = input_size // 2
        self.n_neurons = n_neurons
        self.bias = bias
        self.init_criterion = init_criterion

    def init(self, rng):
        wkey, _ = split_rngs(rng, 2)
        wr, wi = complex_init(wkey, self.in_complex, self.n_neurons,
                              self.init_criterion)
        params = {"real_weight": wr, "imag_weight": wi}
        if self.bias:
            params["bias"] = jnp.zeros((2 * self.n_neurons,))
        return params

    def __call__(self, params, x):
        return complex_linear_op(x, params["real_weight"], params["imag_weight"],
                                 params.get("bias"))


class CConv1d(Module):
    """Complex 1-D convolution over (batch, time, 2C)
    (reference ``complex_networks/CNN.py``)."""

    def __init__(self, out_channels, kernel_size, input_shape=None, input_size=None,
                 stride=1, dilation=1, padding="same", bias=True,
                 init_criterion="glorot"):
        if input_size is None and input_shape is not None:
            input_size = input_shape[-1]
        check_complex_input((input_size,))
        from svt_speechbrain_tpu.nnet.cnn import Conv1d

        self.in_complex = input_size // 2
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.conv_r = Conv1d(out_channels, kernel_size, self.in_complex,
                             stride=stride, dilation=dilation, padding=padding,
                             bias=False)
        self.conv_i = Conv1d(out_channels, kernel_size, self.in_complex,
                             stride=stride, dilation=dilation, padding=padding,
                             bias=False)
        self.bias = bias

    def init(self, rng):
        k1, k2 = split_rngs(rng, 2)
        params = {"real": self.conv_r.init(k1), "imag": self.conv_i.init(k2)}
        if self.bias:
            params["bias"] = jnp.zeros((2 * self.out_channels,))
        return params

    def __call__(self, params, x):
        # (a+ib) * (Wr + iWi): yr = Wr*a - Wi*b ; yi = Wr*b + Wi*a
        xr, xi = get_real(x), get_imag(x)
        yr = self.conv_r(params["real"], xr) - self.conv_i(params["imag"], xi)
        yi = self.conv_r(params["real"], xi) + self.conv_i(params["imag"], xr)
        y = jnp.concatenate([yr, yi], axis=-1)
        if self.bias:
            y = y + params["bias"]
        return y


class CBatchNorm(Module):
    """Simplified complex batch norm: per-component standardization
    (the reference implements full whitening; the split variant is its
    ``complex_networks/normalization.py`` "split" mode)."""

    def __init__(self, input_size, eps=1e-5, momentum=0.1):
        from svt_speechbrain_tpu.nnet.normalization import BatchNorm1d

        self.bn = BatchNorm1d(input_size, eps=eps, momentum=momentum)

    def init(self, rng):
        return self.bn.init(rng)

    def init_state(self):
        return self.bn.init_state()

    def __call__(self, params, state, x, train=False):
        return self.bn(params, state, x, train=train)


class CRNN(Module):
    """Complex-valued recurrent layer: complex affine maps + split tanh
    (reference ``complex_networks/RNN.py`` CliGRU-style simple cell)."""

    def __init__(self, hidden_size, input_shape=None, input_size=None,
                 num_layers=1, bidirectional=False):
        if input_size is None and input_shape is not None:
            input_size = input_shape[-1]
        check_complex_input((input_size,))
        self.hidden_size = hidden_size  # complex units
        self.input_size = input_size
        self.num_layers = num_layers
        self.bidirectional = bidirectional

    def init(self, rng):
        params = {}
        n_dir = 2 if self.bidirectional else 1
        keys = split_rngs(rng, self.num_layers * n_dir * 2)
        ki = 0
        for layer in range(self.num_layers):
            in_c = (self.input_size if layer == 0
                    else 2 * self.hidden_size * n_dir) // 2
            for d in range(n_dir):
                name = f"l{layer}" + ("_rev" if d else "")
                wr_ih, wi_ih = complex_init(keys[ki], in_c, self.hidden_size)
                wr_hh, wi_hh = complex_init(keys[ki + 1], self.hidden_size,
                                            self.hidden_size)
                params[name] = {"wr_ih": wr_ih, "wi_ih": wi_ih,
                                "wr_hh": wr_hh, "wi_hh": wi_hh,
                                "bias": jnp.zeros((2 * self.hidden_size,))}
                ki += 2
        return params

    def _run(self, p, x, reverse=False):
        if reverse:
            x = jnp.flip(x, axis=1)

        def step(h, x_t):
            z = complex_linear_op(x_t, p["wr_ih"], p["wi_ih"], p["bias"]) \
                + complex_linear_op(h, p["wr_hh"], p["wi_hh"])
            h_new = jnp.tanh(z)
            return h_new, h_new

        h0 = jnp.zeros((x.shape[0], 2 * self.hidden_size))
        _, outs = jax.lax.scan(step, h0, jnp.moveaxis(x, 1, 0))
        outs = jnp.moveaxis(outs, 0, 1)
        return jnp.flip(outs, axis=1) if reverse else outs

    def __call__(self, params, x):
        for layer in range(self.num_layers):
            fwd = self._run(params[f"l{layer}"], x)
            if self.bidirectional:
                bwd = self._run(params[f"l{layer}_rev"], x, reverse=True)
                x = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                x = fwd
        return x
