"""Quaternion-valued neural networks (analogue of reference
``speechbrain/nnet/quaternion_networks/`` ~3k LoC).

A quaternion tensor of width 4N stores ``[r, i, j, k]`` components
consecutively along the last axis. The Hamilton product is expressed as four
real matmuls — the reference's custom autograd
(``q_ops.py:22 QuaternionLinearCustomBackward``) exists to save memory in
torch; under JAX/XLA the same structure is handled by autodiff + remat.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module, split_rngs


def check_quaternion_input(input_shape):
    if input_shape[-1] % 4:
        raise ValueError("Quaternion tensors must have a last dim divisible by 4")


def split_quaternion(x):
    n = x.shape[-1] // 4
    return (x[..., :n], x[..., n:2 * n], x[..., 2 * n:3 * n], x[..., 3 * n:])


def quaternion_init(rng, in_features, out_features, criterion="glorot"):
    """Polar quaternion init (reference ``q_ops.py`` quaternion_init):
    modulus ~ Rayleigh(s), unit-imaginary axis, random phase."""
    if criterion == "glorot":
        s = 1.0 / np.sqrt(2.0 * (in_features + out_features))
    else:
        s = 1.0 / np.sqrt(2.0 * in_features)
    k1, k2, k3 = jax.random.split(rng, 3)
    shape = (in_features, out_features)
    modulus = s * jnp.sqrt(-2.0 * jnp.log(
        jax.random.uniform(k1, shape, minval=1e-7, maxval=1.0)))
    v = jax.random.normal(k2, shape + (3,))
    v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-9)
    phase = jax.random.uniform(k3, shape, minval=-np.pi, maxval=np.pi)
    wr = modulus * jnp.cos(phase)
    wi = modulus * v[..., 0] * jnp.sin(phase)
    wj = modulus * v[..., 1] * jnp.sin(phase)
    wk = modulus * v[..., 2] * jnp.sin(phase)
    return wr, wi, wj, wk


def quaternion_linear_op(x, wr, wi, wj, wk, bias=None):
    """Hamilton product y = x ⊗ W over packed tensors
    (reference ``q_ops.py`` quaternion_linear_op).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> x = jnp.asarray([[0.0, 1.0, 0.0, 0.0]])            # pure i
    >>> wr, wi, wj, wk = (jnp.asarray([[v]]) for v in (0., 0., 1., 0.))  # j
    >>> quaternion_linear_op(x, wr, wi, wj, wk)            # i ⊗ j = k
    Array([[0., 0., 0., 1.]], dtype=float32)
    """
    xr, xi, xj, xk = split_quaternion(x)
    yr = xr @ wr - xi @ wi - xj @ wj - xk @ wk
    yi = xr @ wi + xi @ wr + xj @ wk - xk @ wj
    yj = xr @ wj - xi @ wk + xj @ wr + xk @ wi
    yk = xr @ wk + xi @ wj - xj @ wi + xk @ wr
    y = jnp.concatenate([yr, yi, yj, yk], axis=-1)
    if bias is not None:
        y = y + bias
    return y


class QLinear(Module):
    """Quaternion linear layer (reference ``quaternion_networks/linear.py``).
    ``n_neurons`` counts quaternion units (output width 4*n_neurons)."""

    def __init__(self, n_neurons, input_shape=None, input_size=None, bias=True,
                 init_criterion="glorot", weight_init="quaternion",
                 autograd=True):
        if input_size is None and input_shape is not None:
            input_size = input_shape[-1]
        check_quaternion_input((input_size,))
        self.in_q = input_size // 4
        self.n_neurons = n_neurons
        self.bias = bias
        self.init_criterion = init_criterion

    def init(self, rng):
        wr, wi, wj, wk = quaternion_init(rng, self.in_q, self.n_neurons,
                                         self.init_criterion)
        params = {"r_weight": wr, "i_weight": wi, "j_weight": wj, "k_weight": wk}
        if self.bias:
            params["bias"] = jnp.zeros((4 * self.n_neurons,))
        return params

    def __call__(self, params, x):
        return quaternion_linear_op(x, params["r_weight"], params["i_weight"],
                                    params["j_weight"], params["k_weight"],
                                    params.get("bias"))


class QConv1d(Module):
    """Quaternion 1-D convolution (reference ``quaternion_networks/CNN.py``)."""

    def __init__(self, out_channels, kernel_size, input_shape=None, input_size=None,
                 stride=1, dilation=1, padding="same", bias=True):
        if input_size is None and input_shape is not None:
            input_size = input_shape[-1]
        check_quaternion_input((input_size,))
        from svt_speechbrain_tpu.nnet.cnn import Conv1d

        self.in_q = input_size // 4
        self.out_channels = out_channels
        self.convs = {c: Conv1d(out_channels, kernel_size, self.in_q, stride=stride,
                                dilation=dilation, padding=padding, bias=False)
                      for c in "rijk"}
        self.bias = bias

    def init(self, rng):
        keys = split_rngs(rng, 4)
        params = {c: conv.init(k) for (c, conv), k in zip(self.convs.items(), keys)}
        if self.bias:
            params["bias"] = jnp.zeros((4 * self.out_channels,))
        return params

    def __call__(self, params, x):
        xr, xi, xj, xk = split_quaternion(x)
        cr = lambda v: self.convs["r"](params["r"], v)
        ci = lambda v: self.convs["i"](params["i"], v)
        cj = lambda v: self.convs["j"](params["j"], v)
        ck = lambda v: self.convs["k"](params["k"], v)
        # same x ⊗ W convention as quaternion_linear_op (tested equal at 1x1)
        yr = cr(xr) - ci(xi) - cj(xj) - ck(xk)
        yi = ci(xr) + cr(xi) + ck(xj) - cj(xk)
        yj = cj(xr) - ck(xi) + cr(xj) + ci(xk)
        yk = ck(xr) + cj(xi) - ci(xj) + cr(xk)
        y = jnp.concatenate([yr, yi, yj, yk], axis=-1)
        if self.bias:
            y = y + params["bias"]
        return y


class QRNN(Module):
    """Quaternion recurrent layer (reference ``quaternion_networks/RNN.py``:
    simple tanh cell over Hamilton-product affine maps)."""

    def __init__(self, hidden_size, input_shape=None, input_size=None,
                 num_layers=1, bidirectional=False):
        if input_size is None and input_shape is not None:
            input_size = input_shape[-1]
        check_quaternion_input((input_size,))
        self.hidden_size = hidden_size  # quaternion units
        self.input_size = input_size
        self.num_layers = num_layers
        self.bidirectional = bidirectional

    def init(self, rng):
        params = {}
        n_dir = 2 if self.bidirectional else 1
        keys = split_rngs(rng, self.num_layers * n_dir * 2)
        ki = 0
        for layer in range(self.num_layers):
            in_q = (self.input_size if layer == 0
                    else 4 * self.hidden_size * n_dir) // 4
            for d in range(n_dir):
                name = f"l{layer}" + ("_rev" if d else "")
                ih = quaternion_init(keys[ki], in_q, self.hidden_size)
                hh = quaternion_init(keys[ki + 1], self.hidden_size, self.hidden_size)
                params[name] = {
                    "ih": dict(zip(("r", "i", "j", "k"), ih)),
                    "hh": dict(zip(("r", "i", "j", "k"), hh)),
                    "bias": jnp.zeros((4 * self.hidden_size,)),
                }
                ki += 2
        return params

    def _run(self, p, x, reverse=False):
        if reverse:
            x = jnp.flip(x, axis=1)

        def step(h, x_t):
            z = quaternion_linear_op(x_t, p["ih"]["r"], p["ih"]["i"], p["ih"]["j"],
                                     p["ih"]["k"], p["bias"])
            z = z + quaternion_linear_op(h, p["hh"]["r"], p["hh"]["i"],
                                         p["hh"]["j"], p["hh"]["k"])
            h_new = jnp.tanh(z)
            return h_new, h_new

        h0 = jnp.zeros((x.shape[0], 4 * self.hidden_size))
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


class QConv2d(Module):
    """Quaternion 2-D convolution over (batch, H, W, 4C)
    (reference ``quaternion_networks/q_CNN.py`` QConv2d)."""

    def __init__(self, out_channels, kernel_size, input_shape=None,
                 input_size=None, stride=1, dilation=1, padding="same",
                 bias=True):
        if input_size is None and input_shape is not None:
            input_size = input_shape[-1]
        check_quaternion_input((input_size,))
        from svt_speechbrain_tpu.nnet.cnn import Conv2d

        self.in_q = input_size // 4
        self.out_channels = out_channels
        self.convs = {c: Conv2d(out_channels, kernel_size, self.in_q,
                                stride=stride, dilation=dilation,
                                padding=padding, bias=False)
                      for c in "rijk"}
        self.bias = bias

    def init(self, rng):
        keys = split_rngs(rng, 4)
        params = {c: conv.init(k) for (c, conv), k in zip(self.convs.items(), keys)}
        if self.bias:
            params["bias"] = jnp.zeros((4 * self.out_channels,))
        return params

    def __call__(self, params, x):
        xr, xi, xj, xk = split_quaternion(x)
        cr = lambda v: self.convs["r"](params["r"], v)
        ci = lambda v: self.convs["i"](params["i"], v)
        cj = lambda v: self.convs["j"](params["j"], v)
        ck = lambda v: self.convs["k"](params["k"], v)
        # same x ⊗ W convention as quaternion_linear_op (tested equal at 1x1)
        yr = cr(xr) - ci(xi) - cj(xj) - ck(xk)
        yi = ci(xr) + cr(xi) + ck(xj) - cj(xk)
        yj = cj(xr) - ck(xi) + cr(xj) + ci(xk)
        yk = ck(xr) + cj(xi) - ci(xj) + cr(xk)
        y = jnp.concatenate([yr, yi, yj, yk], axis=-1)
        if self.bias:
            y = y + params["bias"]
        return y


class QBatchNorm(Module):
    """Quaternion batch norm, split mode: component-wise standardization
    (the reference's ``q_normalization.py`` full quaternion whitening is
    simplified to its split variant, like ``CBatchNorm``)."""

    def __init__(self, input_size, dim=-1, eps=1e-5, momentum=0.1):
        from svt_speechbrain_tpu.nnet.normalization import BatchNorm1d

        self.bn = BatchNorm1d(input_size, eps=eps, momentum=momentum)

    def init(self, rng):
        return self.bn.init(rng)

    def init_state(self):
        return self.bn.init_state()

    def __call__(self, params, state, x, train=False):
        return self.bn(params, state, x, train=train)


class _QGatedRNNBase(Module):
    """Gated quaternion recurrences (QLSTM / QLiGRU): Hamilton-product
    affine maps per gate with split activations (reference ``q_RNN.py``)."""

    GATES = ()

    def __init__(self, hidden_size, input_shape=None, input_size=None,
                 num_layers=1, bidirectional=False):
        if input_size is None and input_shape is not None:
            input_size = input_shape[-1]
        check_quaternion_input((input_size,))
        self.hidden_size = hidden_size
        self.input_size = input_size
        self.num_layers = num_layers
        self.bidirectional = bidirectional

    def init(self, rng):
        params = {}
        n_dir = 2 if self.bidirectional else 1
        keys = split_rngs(rng, self.num_layers * n_dir * len(self.GATES) * 2)
        ki = 0
        for layer in range(self.num_layers):
            in_q = (self.input_size if layer == 0
                    else 4 * self.hidden_size * n_dir) // 4
            for d in range(n_dir):
                name = f"l{layer}" + ("_rev" if d else "")
                p = {}
                for gate in self.GATES:
                    w_ih = quaternion_init(keys[ki], in_q, self.hidden_size)
                    w_hh = quaternion_init(keys[ki + 1], self.hidden_size,
                                           self.hidden_size)
                    p[gate] = {"ih": w_ih, "hh": w_hh,
                               "bias": jnp.zeros((4 * self.hidden_size,))}
                    ki += 2
                params[name] = p
        return params

    def _gate(self, p, gate, x_t, h):
        g = p[gate]
        return (quaternion_linear_op(x_t, *g["ih"], bias=g["bias"])
                + quaternion_linear_op(h, *g["hh"]))

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


class QLSTM(_QGatedRNNBase):
    """Quaternion LSTM (reference ``q_RNN.py`` QLSTM)."""

    GATES = ("i", "f", "g", "o")

    def _init_state(self, batch):
        z = jnp.zeros((batch, 4 * self.hidden_size))
        return (z, z)

    def _cell(self, p, x_t, state):
        h, c = state
        i = jax.nn.sigmoid(self._gate(p, "i", x_t, h))
        f = jax.nn.sigmoid(self._gate(p, "f", x_t, h))
        g = jnp.tanh(self._gate(p, "g", x_t, h))
        o = jax.nn.sigmoid(self._gate(p, "o", x_t, h))
        c_new = f * c + i * g
        return (o * jnp.tanh(c_new), c_new)


class QLiGRU(_QGatedRNNBase):
    """Quaternion light GRU (reference ``q_RNN.py`` QLiGRU)."""

    GATES = ("z", "h")

    def _init_state(self, batch):
        return jnp.zeros((batch, 4 * self.hidden_size))

    def _cell(self, p, x_t, h):
        z = jax.nn.sigmoid(self._gate(p, "z", x_t, h))
        hcand = jax.nn.relu(self._gate(p, "h", x_t, h))
        return z * h + (1 - z) * hcand


QRNN_Layer = QRNN
QLSTM_Layer = QLSTM
QLiGRU_Layer = QLiGRU


# --- reference ``q_ops.py`` public helpers -------------------------------

def unitary_init(rng, in_features, out_features, criterion="glorot"):
    """Unit-quaternion init (reference ``q_ops.py:unitary_init``)."""
    del criterion
    k = jax.random.normal(rng, (4, in_features, out_features))
    norm = jnp.sqrt(jnp.sum(jnp.square(k), axis=0, keepdims=True)) + 1e-12
    k = k / norm / jnp.sqrt(jnp.asarray(in_features, jnp.float32))
    return k[0], k[1], k[2], k[3]


def affect_init(r, i, j, kk, init_func, rng, criterion="glorot"):
    """Fill quaternion weights with ``init_func`` output
    (reference ``q_ops.py:affect_init``)."""
    return init_func(rng, r.shape[0], r.shape[1], criterion)


def affect_conv_init(r, i, j, kk, kernel_size, init_func, rng,
                     criterion="glorot"):
    """Conv variant of ``affect_init`` (reference ``q_ops.py``)."""
    fan_in, fan_out = r.shape[-2], r.shape[-1]
    comps = init_func(rng, fan_in, fan_out, criterion)
    return tuple(jnp.broadcast_to(c, r.shape) for c in comps)


def quaternion_conv_op(x, wr, wi, wj, wk, bias, stride=1, padding="same",
                       dilation=1, conv1d=True):
    """Functional quaternion convolution with the x ⊗ W Hamilton layout
    (reference ``q_ops.py:quaternion_conv_op``)."""
    from svt_speechbrain_tpu.nnet.cnn import Conv1d, Conv2d

    cls = Conv1d if conv1d else Conv2d
    out_ch, in_ch, k = wr.shape[-1], wr.shape[-2], wr.shape[:-2]
    conv = cls(out_ch, k if len(k) > 1 else k[0], in_ch, stride=stride,
               dilation=dilation, padding=padding, bias=False)
    xr, xi, xj, xk = split_quaternion(x)
    cr = lambda v: conv({"w": wr}, v)
    ci = lambda v: conv({"w": wi}, v)
    cj = lambda v: conv({"w": wj}, v)
    ck = lambda v: conv({"w": wk}, v)
    yr = cr(xr) - ci(xi) - cj(xj) - ck(xk)
    yi = ci(xr) + cr(xi) + ck(xj) - cj(xk)
    yj = cj(xr) - ck(xi) + cr(xj) + ci(xk)
    yk = ck(xr) + cj(xi) - ci(xj) + cr(xk)
    y = jnp.concatenate([yr, yi, yj, yk], axis=-1)
    if bias is not None:
        y = y + bias
    return y


def _rotation_matrix_rows(wr, wi, wj, wk):
    n = jnp.sqrt(wr ** 2 + wi ** 2 + wj ** 2 + wk ** 2) + 1e-12
    r, i, j, k = wr / n, wi / n, wj / n, wk / n
    row1 = (1 - 2 * (j ** 2 + k ** 2), 2 * (i * j - k * r), 2 * (i * k + j * r))
    row2 = (2 * (i * j + k * r), 1 - 2 * (i ** 2 + k ** 2), 2 * (j * k - i * r))
    row3 = (2 * (i * k - j * r), 2 * (j * k + i * r), 1 - 2 * (i ** 2 + j ** 2))
    return row1, row2, row3


def quaternion_linear_rotation_op(x, wr, wi, wj, wk, bias=None, scale=None):
    """Rotation-parameterized quaternion linear op (reference
    ``q_ops.py:quaternion_linear_rotation_op``): the 3-D vector part of the
    input is rotated by the unit quaternion of each weight."""
    _, xi, xj, xk = split_quaternion(x)
    (a1, a2, a3), (b1, b2, b3), (c1, c2, c3) = _rotation_matrix_rows(
        wr, wi, wj, wk)
    if scale is not None:
        a1, a2, a3 = scale * a1, scale * a2, scale * a3
        b1, b2, b3 = scale * b1, scale * b2, scale * b3
        c1, c2, c3 = scale * c1, scale * c2, scale * c3
    yr = jnp.zeros(x.shape[:-1] + (wr.shape[-1],), x.dtype)
    yi = xi @ a1 + xj @ a2 + xk @ a3
    yj = xi @ b1 + xj @ b2 + xk @ b3
    yk = xi @ c1 + xj @ c2 + xk @ c3
    y = jnp.concatenate([yr, yi, yj, yk], axis=-1)
    if bias is not None:
        y = y + bias
    return y


def quaternion_conv_rotation_op(x, wr, wi, wj, wk, bias=None, scale=None,
                                stride=1, padding="same", dilation=1,
                                conv1d=True):
    """Conv variant of the rotation op (reference
    ``q_ops.py:quaternion_conv_rotation_op``)."""
    from svt_speechbrain_tpu.nnet.cnn import Conv1d, Conv2d

    cls = Conv1d if conv1d else Conv2d
    out_ch, in_ch, k = wr.shape[-1], wr.shape[-2], wr.shape[:-2]
    conv = cls(out_ch, k if len(k) > 1 else k[0], in_ch, stride=stride,
               dilation=dilation, padding=padding, bias=False)
    rows = _rotation_matrix_rows(wr, wi, wj, wk)
    if scale is not None:
        rows = tuple(tuple(scale * w for w in row) for row in rows)
    _, xi, xj, xk = split_quaternion(x)
    (a1, a2, a3), (b1, b2, b3), (c1, c2, c3) = rows
    cv = lambda w, v: conv({"w": w}, v)
    yi = cv(a1, xi) + cv(a2, xj) + cv(a3, xk)
    yj = cv(b1, xi) + cv(b2, xj) + cv(b3, xk)
    yk = cv(c1, xi) + cv(c2, xj) + cv(c3, xk)
    yr = jnp.zeros_like(yi)
    y = jnp.concatenate([yr, yi, yj, yk], axis=-1)
    if bias is not None:
        y = y + bias
    return y


# The reference's QuaternionLinearCustomBackward saves memory by rebuilding
# the Hamilton weight matrix in backward; jax autodiff already recomputes it
# from the four component weights, so the plain op is the equivalent.
QuaternionLinearCustomBackward = quaternion_linear_op
