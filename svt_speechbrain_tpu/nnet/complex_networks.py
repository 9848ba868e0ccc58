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
    (reference ``c_ops.py`` complex_linear_op).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> x = jnp.asarray([[1.0, 2.0]])                 # one unit: 1 + 2j
    >>> wr, wi = jnp.asarray([[3.0]]), jnp.asarray([[4.0]])   # weight 3 + 4j
    >>> complex_linear_op(x, wr, wi)                  # (1+2j)(3+4j) = -5+10j
    Array([[-5., 10.]], dtype=float32)
    """
    xr, xi = get_real(x), get_imag(x)
    yr = xr @ real_weight - xi @ imag_weight
    yi = xr @ imag_weight + xi @ real_weight
    y = jnp.concatenate([yr, yi], axis=-1)
    if bias is not None:
        y = y + bias
    return y


class CLinear(Module):
    """Complex linear layer (reference ``complex_networks/linear.py``).
    ``n_neurons`` counts complex units (output width = 2*n_neurons).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> lin = CLinear(n_neurons=4, input_size=2)
    >>> params = lin.init(jax.random.PRNGKey(0))
    >>> lin(params, jnp.ones((2, 5, 2))).shape
    (2, 5, 8)
    """

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


class CConv2d(Module):
    """Complex 2-D convolution over (batch, H, W, 2C)
    (reference ``complex_networks/c_CNN.py`` CConv2d)."""

    def __init__(self, out_channels, kernel_size, input_shape=None,
                 input_size=None, stride=1, dilation=1, padding="same",
                 bias=True):
        if input_size is None and input_shape is not None:
            input_size = input_shape[-1]
        check_complex_input((input_size,))
        from svt_speechbrain_tpu.nnet.cnn import Conv2d

        self.in_complex = input_size // 2
        self.out_channels = out_channels
        self.conv_r = Conv2d(out_channels, kernel_size, self.in_complex,
                             stride=stride, dilation=dilation,
                             padding=padding, bias=False)
        self.conv_i = Conv2d(out_channels, kernel_size, self.in_complex,
                             stride=stride, dilation=dilation,
                             padding=padding, bias=False)
        self.bias = bias

    def init(self, rng):
        k1, k2 = split_rngs(rng, 2)
        params = {"real": self.conv_r.init(k1), "imag": self.conv_i.init(k2)}
        if self.bias:
            params["bias"] = jnp.zeros((2 * self.out_channels,))
        return params

    def __call__(self, params, x):
        xr, xi = get_real(x), get_imag(x)
        yr = self.conv_r(params["real"], xr) - self.conv_i(params["imag"], xi)
        yi = self.conv_r(params["real"], xi) + self.conv_i(params["imag"], xr)
        y = jnp.concatenate([yr, yi], axis=-1)
        if self.bias:
            y = y + params["bias"]
        return y


class CLayerNorm(Module):
    """Complex layer norm, split mode: each component standardized over
    features (the reference's ``c_normalization.py`` also offers full
    covariance whitening; the split variant matches its "split" mode and is
    the documented simplification, like ``CBatchNorm``)."""

    def __init__(self, input_size, eps=1e-5):
        self.input_size = input_size
        self.eps = eps

    def init(self, rng):
        del rng
        return {"scale": jnp.ones((self.input_size,)),
                "bias": jnp.zeros((self.input_size,))}

    def __call__(self, params, x):
        from svt_speechbrain_tpu.nnet.normalization import layer_norm

        xr, xi = get_real(x), get_imag(x)
        h = self.input_size // 2
        yr = layer_norm(xr, params["scale"][:h], params["bias"][:h], eps=self.eps)
        yi = layer_norm(xi, params["scale"][h:], params["bias"][h:], eps=self.eps)
        return jnp.concatenate([yr, yi], axis=-1)


class _CGatedRNNBase(Module):
    """Shared machinery for gated complex recurrences (CLSTM / CLiGRU):
    complex affine maps per gate, split (component-wise) activations —
    the reference's design (``c_RNN.py``: gates act on the packed 2H
    vector)."""

    GATES = ()

    def __init__(self, hidden_size, input_shape=None, input_size=None,
                 num_layers=1, bidirectional=False):
        if input_size is None and input_shape is not None:
            input_size = input_shape[-1]
        check_complex_input((input_size,))
        self.hidden_size = hidden_size
        self.input_size = input_size
        self.num_layers = num_layers
        self.bidirectional = bidirectional

    def init(self, rng):
        params = {}
        n_dir = 2 if self.bidirectional else 1
        g = len(self.GATES)
        keys = split_rngs(rng, self.num_layers * n_dir * g * 2)
        ki = 0
        for layer in range(self.num_layers):
            in_c = (self.input_size if layer == 0
                    else 2 * self.hidden_size * n_dir) // 2
            for d in range(n_dir):
                name = f"l{layer}" + ("_rev" if d else "")
                p = {}
                for gate in self.GATES:
                    wr_ih, wi_ih = complex_init(keys[ki], in_c, self.hidden_size)
                    wr_hh, wi_hh = complex_init(keys[ki + 1], self.hidden_size,
                                                self.hidden_size)
                    p[gate] = {"wr_ih": wr_ih, "wi_ih": wi_ih,
                               "wr_hh": wr_hh, "wi_hh": wi_hh,
                               "bias": jnp.zeros((2 * self.hidden_size,))}
                    ki += 2
                params[name] = p
                ki += 0
        return params

    def _gate(self, p, gate, x_t, h):
        g = p[gate]
        return (complex_linear_op(x_t, g["wr_ih"], g["wi_ih"], g["bias"])
                + complex_linear_op(h, g["wr_hh"], g["wi_hh"]))

    def _run(self, p, x, reverse=False):
        if reverse:
            x = jnp.flip(x, axis=1)
        state0 = self._init_state(x.shape[0])

        def step(state, x_t):
            new = self._cell(p, x_t, state)
            out = new[0] if isinstance(new, tuple) else new
            return new, out

        _, outs = jax.lax.scan(step, state0, jnp.moveaxis(x, 1, 0))
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


class CLSTM(_CGatedRNNBase):
    """Complex LSTM with split activations (reference ``c_RNN.py`` CLSTM)."""

    GATES = ("i", "f", "g", "o")

    def _init_state(self, batch):
        z = jnp.zeros((batch, 2 * self.hidden_size))
        return (z, z)

    def _cell(self, p, x_t, state):
        h, c = state
        i = jax.nn.sigmoid(self._gate(p, "i", x_t, h))
        f = jax.nn.sigmoid(self._gate(p, "f", x_t, h))
        g = jnp.tanh(self._gate(p, "g", x_t, h))
        o = jax.nn.sigmoid(self._gate(p, "o", x_t, h))
        c_new = f * c + i * g
        return (o * jnp.tanh(c_new), c_new)


class CLiGRU(_CGatedRNNBase):
    """Complex light GRU (reference ``c_RNN.py`` CLiGRU): update gate +
    ReLU candidate, no reset gate."""

    GATES = ("z", "h")

    def _init_state(self, batch):
        return jnp.zeros((batch, 2 * self.hidden_size))

    def _cell(self, p, x_t, h):
        z = jax.nn.sigmoid(self._gate(p, "z", x_t, h))
        hcand = jax.nn.relu(self._gate(p, "h", x_t, h))
        return z * h + (1 - z) * hcand


CRNN_Layer = CRNN
CLSTM_Layer = CLSTM
CLiGRU_Layer = CLiGRU


# --- reference ``c_ops.py`` public helpers -------------------------------

def unitary_init(rng, in_features, out_features, criterion="glorot"):
    """Unitary-ish complex init: random phases with unit-modulus columns
    (reference ``c_ops.py:unitary_init``)."""
    k1, k2 = split_rngs(rng, 2)
    theta = jax.random.uniform(k1, (in_features, out_features),
                               minval=-jnp.pi, maxval=jnp.pi)
    del k2, criterion
    scale = 1.0 / jnp.sqrt(jnp.asarray(in_features, jnp.float32))
    return scale * jnp.cos(theta), scale * jnp.sin(theta)


def affect_init(real_weight, imag_weight, init_func, rng, criterion="glorot"):
    """Fill (real, imag) weights with ``init_func`` output
    (reference ``c_ops.py:affect_init``)."""
    return init_func(rng, real_weight.shape[0], real_weight.shape[1],
                     criterion)


def affect_conv_init(real_weight, imag_weight, kernel_size, init_func, rng,
                     criterion="glorot"):
    """Conv variant of ``affect_init`` (reference ``c_ops.py``)."""
    fan_in = real_weight.shape[-2]
    fan_out = real_weight.shape[-1]
    r, i = init_func(rng, fan_in, fan_out, criterion)
    shape = real_weight.shape
    return (jnp.broadcast_to(r, shape), jnp.broadcast_to(i, shape))


def get_conjugate(x):
    """Negate the imaginary half of a packed complex tensor
    (reference ``c_ops.py:get_conjugate``)."""
    return jnp.concatenate([get_real(x), -get_imag(x)], axis=-1)


def multi_mean(x, axes, keepdim=False):
    """Mean over several axes sequentially (reference
    ``c_ops.py:multi_mean``)."""
    for ax in sorted(axes, reverse=True):
        x = jnp.mean(x, axis=ax, keepdims=keepdim)
    return x


def complex_conv_op(x, real_weight, imag_weight, bias, stride=1,
                    padding="same", dilation=1, conv1d=True):
    """Functional complex convolution (reference ``c_ops.py:
    complex_conv_op``): packs the two real convs of (a+ib)·(Wr+iWi)."""
    from svt_speechbrain_tpu.nnet.cnn import Conv1d, Conv2d

    cls = Conv1d if conv1d else Conv2d
    out_ch = real_weight.shape[-1]
    in_ch = real_weight.shape[-2]
    k = real_weight.shape[:-2]
    conv = cls(out_ch, k if len(k) > 1 else k[0], in_ch, stride=stride,
               dilation=dilation, padding=padding, bias=False)
    xr, xi = get_real(x), get_imag(x)
    yr = conv({"w": real_weight}, xr) - conv({"w": imag_weight}, xi)
    yi = conv({"w": real_weight}, xi) + conv({"w": imag_weight}, xr)
    y = jnp.concatenate([yr, yi], axis=-1)
    if bias is not None:
        y = y + bias
    return y


def c_standardization(input_centred, Vrr, Vii, Vri, eps=1e-5):
    """Whiten a centred packed-complex tensor by the inverse square root of
    its 2×2 real/imag covariance (reference ``c_normalization.py:630``):
    with V = [[Vrr, Vri], [Vri, Vii]], y = V^{-1/2} x computed in closed
    form via trace/determinant."""
    tau = Vrr + Vii
    delta = Vrr * Vii - Vri ** 2 + eps
    s = jnp.sqrt(delta)
    t = jnp.sqrt(tau + 2 * s)
    inverse_st = 1.0 / (s * t)
    Wrr = (Vii + s) * inverse_st
    Wii = (Vrr + s) * inverse_st
    Wri = -Vri * inverse_st
    xr, xi = get_real(input_centred), get_imag(input_centred)
    return jnp.concatenate([Wrr * xr + Wri * xi, Wri * xr + Wii * xi],
                           axis=-1)


def c_norm(input_centred, Vrr, Vii, Vri, beta=None, gamma_rr=None,
           gamma_ri=None, gamma_ii=None, scale=True, center=True, eps=1e-5):
    """Complex normalization: whitening plus the complex affine transform
    with the [[γ_rr, γ_ri], [γ_ri, γ_ii]] scale matrix and β shift
    (reference ``c_normalization.py:697``)."""
    out = c_standardization(input_centred, Vrr, Vii, Vri, eps=eps)
    if scale and gamma_rr is not None:
        xr, xi = get_real(out), get_imag(out)
        out = jnp.concatenate([gamma_rr * xr + gamma_ri * xi,
                               gamma_ri * xr + gamma_ii * xi], axis=-1)
    if center and beta is not None:
        out = out + beta
    return out
