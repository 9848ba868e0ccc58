"""Quaternion-valued neural networks, reference-exact
(reference ``speechbrain/nnet/quaternion_networks/`` ~3k LoC: ``q_ops.py``,
``q_linear.py``, ``q_CNN.py``, ``q_normalization.py``, ``q_RNN.py``).

Packing convention follows the reference: a quaternion tensor of width 4N
stores ``[r_0..r_{N-1}, i_0.., j_0.., k_0..]`` along the last axis. The
forward op computes the Hamilton product **W ⊗ x** (weight on the LEFT —
``q_ops.py:179`` builds the matrix so ``x @ K`` equals W*x), expressed as
four real MXU matmuls.

Reference quirks mirrored exactly (golden-tested in
``tests/test_quaternion_golden.py``):

- The recurrences slice their fused gate projections CONTIGUOUSLY
  (``gates.chunk(16, 1)`` + pairwise cat == contiguous 4H slices), cutting
  across the quaternion packing; the wrappers ALWAYS return
  ``(output, h)`` (no return_hidden flag, unlike the complex twins).
- ``QLiGRU``'s non-batchnorm modes apply NO normalization
  (``q_RNN.py:1075``: ``normalize=False`` — unlike the complex CLiGRU,
  whose fallback applies CLayerNorm); its default nonlinearity is
  leaky_relu.
- ``QBatchNorm`` (``q_normalization.py``) never subtracts the mean in
  train mode (``out = input / sqrt(var+eps)`` despite the comment), and
  its eval path divides by the raw running VARIANCE with no sqrt and no
  eps. Batch stats reduce over axis 0 only; the running-stat update
  ``mu.view(running_mean.size())`` CRASHES on 3-D+ inputs in the
  reference — ours averages the leading axes (evident intent), proven
  equal on the 2-D inputs the reference actually runs (QLiGRU flattens).
- The spinor (rotation) ops: the LINEAR op adds its norm eps OUTSIDE the
  sqrt and indexes the rotation matrix by INPUT component
  (``q_ops.py:234``), while the CONV op puts the eps INSIDE the sqrt and
  indexes by OUTPUT channel (``q_ops.py:365``) — the two use transposed
  rotation matrices; both orientations mirrored.
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
    """Polar quaternion init (reference ``q_ops.py:quaternion_init``):
    modulus ~ chi(4 df, scale s), unit pure-imaginary axis, random phase."""
    if criterion == "glorot":
        s = 1.0 / np.sqrt(2.0 * (in_features + out_features))
    else:
        s = 1.0 / np.sqrt(2.0 * in_features)
    k1, k2, k3 = jax.random.split(rng, 3)
    shape = (in_features, out_features)
    # chi with 4 degrees of freedom = the norm of 4 iid N(0, s) draws
    modulus = s * jnp.sqrt(jnp.sum(
        jax.random.normal(k1, shape + (4,)) ** 2, axis=-1))
    v = jax.random.uniform(k2, shape + (3,), minval=-1.0, maxval=1.0)
    v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-4)
    phase = jax.random.uniform(k3, shape, minval=-np.pi, maxval=np.pi)
    wr = modulus * jnp.cos(phase)
    wi = modulus * v[..., 0] * jnp.sin(phase)
    wj = modulus * v[..., 1] * jnp.sin(phase)
    wk = modulus * v[..., 2] * jnp.sin(phase)
    return wr, wi, wj, wk


def quaternion_linear_op(x, wr, wi, wj, wk, bias=None):
    """Hamilton product y = W ⊗ x over packed tensors (reference
    ``q_ops.py:quaternion_linear_op`` — the weight multiplies on the LEFT).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> x = jnp.asarray([[0.0, 1.0, 0.0, 0.0]])            # pure i
    >>> wr, wi, wj, wk = (jnp.asarray([[v]]) for v in (0., 0., 1., 0.))  # j
    >>> quaternion_linear_op(x, wr, wi, wj, wk)            # j ⊗ i = -k
    Array([[ 0.,  0.,  0., -1.]], dtype=float32)
    """
    xr, xi, xj, xk = split_quaternion(x)
    yr = xr @ wr - xi @ wi - xj @ wj - xk @ wk
    yi = xr @ wi + xi @ wr - xj @ wk + xk @ wj
    yj = xr @ wj + xi @ wk + xj @ wr - xk @ wi
    yk = xr @ wk - xi @ wj + xj @ wi + xk @ wr
    y = jnp.concatenate([yr, yi, yj, yk], axis=-1)
    if bias is not None:
        y = y + bias
    return y


class QLinear(Module):
    """Quaternion linear layer (reference ``q_linear.py:QLinear``).
    ``n_neurons`` counts quaternion units (output width 4*n_neurons).
    ``spinor=True`` turns it into a rotation layer (W x W^-1 on the vector
    part); ``vector_scale`` adds the learnable per-rotation gate.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> lin = QLinear(n_neurons=4, input_size=8)
    >>> params = lin.init(jax.random.PRNGKey(0))
    >>> lin(params, jnp.ones((2, 8))).shape
    (2, 16)
    """

    def __init__(self, n_neurons, input_shape=None, input_size=None, bias=True,
                 init_criterion="glorot", weight_init="quaternion",
                 autograd=True, spinor=False, vector_scale=False):
        if input_size is None and input_shape is not None:
            input_size = input_shape[-1]
        check_quaternion_input((input_size,))
        self.in_q = input_size // 4
        self.n_neurons = n_neurons
        self.bias = bias
        self.init_criterion = init_criterion
        self.weight_init = weight_init
        self.spinor = spinor
        self.vector_scale = vector_scale

    def init(self, rng):
        wkey, skey = split_rngs(rng, 2)
        init_fn = {"quaternion": quaternion_init, "unitary": unitary_init}[
            self.weight_init]
        wr, wi, wj, wk = init_fn(wkey, self.in_q, self.n_neurons,
                                 self.init_criterion)
        params = {"r_weight": wr, "i_weight": wi, "j_weight": wj,
                  "k_weight": wk}
        if self.spinor and self.vector_scale:
            bound = np.sqrt(6.0 / (self.in_q + self.n_neurons))
            params["scale"] = jax.random.uniform(
                skey, (self.in_q, self.n_neurons), minval=-bound, maxval=bound)
        if self.bias:
            params["bias"] = jnp.zeros((4 * self.n_neurons,))
        return params

    def __call__(self, params, x):
        if self.spinor:
            return quaternion_linear_rotation_op(
                x, params["r_weight"], params["i_weight"], params["j_weight"],
                params["k_weight"], params.get("bias"), params.get("scale"))
        return quaternion_linear_op(x, params["r_weight"], params["i_weight"],
                                    params["j_weight"], params["k_weight"],
                                    params.get("bias"))


class _QConvNd(Module):
    """Shared quaternion conv: W ⊗ x Hamilton layout over four real convs,
    reflect same-padding by default (reference ``q_CNN.py``), zero-padded
    causal, optional spinor rotation."""

    NDIM = 1

    def __init__(self, out_channels, kernel_size, input_shape=None,
                 input_size=None, stride=1, dilation=1, padding="same",
                 groups=1, bias=True, padding_mode="reflect",
                 init_criterion="glorot", weight_init="quaternion",
                 spinor=False, vector_scale=False):
        if input_size is None and input_shape is not None:
            input_size = input_shape[-1]
        check_quaternion_input((input_size,))
        from svt_speechbrain_tpu.nnet.cnn import Conv1d, Conv2d

        self.manual_pads = None
        if self.NDIM == 1:
            if kernel_size % 2 == 0:
                raise ValueError("The field kernel size must be an odd "
                                 f"number. Got {kernel_size}.")
            self.k = (kernel_size,)
            conv_k, conv_s, conv_d = kernel_size, stride, dilation
            conv_padding = padding
            cls = Conv1d
            if padding == "causal":
                padding_mode = "zeros"  # reference q_CNN.py:198 zero-pads
        else:
            def pair(v):
                return (v, v) if isinstance(v, int) else tuple(v)

            self.k = pair(kernel_size)
            if self.k[0] % 2 == 0 or self.k[1] % 2 == 0:
                raise ValueError("The field kernel size must be an odd "
                                 f"number. Got {self.k}.")
            if padding == "causal":
                raise ValueError("Padding must be 'same' or 'valid' for "
                                 "QConv2d (reference q_CNN.py:490)")
            s, d = pair(stride), pair(dilation)
            # reference quirks (q_CNN.py:504-525): the conv itself runs with
            # stride[0]/dilation[0] on BOTH axes; the per-axis values only
            # size the same-padding. Axis mapping as in the complex convs:
            # k[0]→feature, k[1]→time.
            conv_k = (self.k[1], self.k[0])
            conv_s, conv_d = s[0], d[0]
            conv_padding = "valid"
            if padding == "same":
                def pad_amt(k, st, dl):
                    return k // 2 if st > 1 else dl * (k - 1) // 2

                # ours is (B, T, F, C): time pad then feature pad
                self.manual_pads = [
                    (pad_amt(self.k[1], s[1], d[1]),) * 2,
                    (pad_amt(self.k[0], s[0], d[0]),) * 2]
            cls = Conv2d
        self.padding = padding
        self.padding_mode = padding_mode
        self.in_q = input_size // 4
        self.out_channels = out_channels
        self.convs = {c: cls(out_channels, conv_k, self.in_q, stride=conv_s,
                             dilation=conv_d, padding=conv_padding,
                             groups=groups, padding_mode=padding_mode,
                             bias=False)
                      for c in "rijk"}
        self.bias = bias
        self.init_criterion = init_criterion
        self.weight_init = weight_init
        self.spinor = spinor
        self.vector_scale = vector_scale

    def init(self, rng):
        wkey, skey = split_rngs(rng, 2)
        init_fn = {"quaternion": quaternion_init, "unitary": unitary_init}[
            self.weight_init]
        receptive = int(np.prod(self.k))
        comps = init_fn(wkey, self.in_q * receptive, self.out_channels,
                        self.init_criterion)
        if self.NDIM == 1:
            shape = (self.k[0], self.in_q, self.out_channels)
        else:
            shape = (self.k[1], self.k[0], self.in_q, self.out_channels)
        params = {c: {"w": w.reshape(shape)} for c, w in zip("rijk", comps)}
        if self.spinor and self.vector_scale:
            bound = np.sqrt(6.0 / (self.in_q + self.out_channels))
            params["scale"] = jax.random.uniform(
                skey, shape, minval=-bound, maxval=bound)
        if self.bias:
            params["bias"] = jnp.zeros((4 * self.out_channels,))
        return params

    def _maybe_pad(self, x):
        if self.manual_pads is None:
            return x
        mode = {"zeros": "constant", "reflect": "reflect",
                "replicate": "edge", "circular": "wrap"}[self.padding_mode]
        return jnp.pad(x, [(0, 0)] + self.manual_pads + [(0, 0)], mode=mode)

    def __call__(self, params, x):
        x = self._maybe_pad(x)
        cv = {c: (lambda v, c=c: self.convs[c](params[c], v)) for c in "rijk"}
        xr, xi, xj, xk = split_quaternion(x)
        if self.spinor:
            return self._rotation_forward(params, x)
        # W ⊗ x: same coefficient pattern as quaternion_linear_op
        yr = cv["r"](xr) - cv["i"](xi) - cv["j"](xj) - cv["k"](xk)
        yi = cv["i"](xr) + cv["r"](xi) - cv["k"](xj) + cv["j"](xk)
        yj = cv["j"](xr) + cv["k"](xi) + cv["r"](xj) - cv["i"](xk)
        yk = cv["k"](xr) - cv["j"](xi) + cv["i"](xj) + cv["r"](xk)
        y = jnp.concatenate([yr, yi, yj, yk], axis=-1)
        if self.bias:
            y = y + params["bias"]
        return y

    def _rotation_forward(self, params, x):
        rows = _rotation_coeffs(params["r"]["w"], params["i"]["w"],
                                params["j"]["w"], params["k"]["w"],
                                eps_inside=True)
        scale = params.get("scale")
        if scale is not None:
            rows = tuple(tuple(scale * w for w in row) for row in rows)
        (a1, a2, a3), (b1, b2, b3), (c1, c2, c3) = rows
        _, xi, xj, xk = split_quaternion(x)

        def cv(w, v):
            return self.convs["r"]({"w": w}, v)

        # conv orientation (q_ops.py:365): rot_kernel_N is OUTPUT block N
        yi = cv(a1, xi) + cv(a2, xj) + cv(a3, xk)
        yj = cv(b1, xi) + cv(b2, xj) + cv(b3, xk)
        yk = cv(c1, xi) + cv(c2, xj) + cv(c3, xk)
        yr = jnp.zeros_like(yi)
        y = jnp.concatenate([yr, yi, yj, yk], axis=-1)
        if self.bias:
            y = y + params["bias"]
        return y


class QConv1d(_QConvNd):
    """Quaternion 1-D convolution over (batch, time, 4C)
    (reference ``q_CNN.py:QConv1d``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> conv = QConv1d(out_channels=3, kernel_size=3, input_size=8)
    >>> params = conv.init(jax.random.PRNGKey(0))
    >>> conv(params, jnp.ones((2, 16, 8))).shape
    (2, 16, 12)
    """

    NDIM = 1


class QConv2d(_QConvNd):
    """Quaternion 2-D convolution over (batch, time, feature, 4C)
    (reference ``q_CNN.py:QConv2d``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> conv = QConv2d(out_channels=3, kernel_size=3, input_size=8)
    >>> params = conv.init(jax.random.PRNGKey(0))
    >>> conv(params, jnp.ones((2, 10, 12, 8))).shape
    (2, 10, 12, 12)
    """

    NDIM = 2


class QBatchNorm(Module):
    """Quaternion batch norm, reference-exact incl. its quirks (reference
    ``q_normalization.py:QBatchNorm``): shared scalar variance across the
    four components; train mode divides the UNCENTERED input by
    sqrt(var+eps); eval subtracts the running mean then divides by the raw
    running VARIANCE (no sqrt, no eps — reference bug mirrored); batch
    stats reduce over axis 0 only.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> bn = QBatchNorm(input_size=8)
    >>> params, state = bn.init(jax.random.PRNGKey(0)), bn.init_state()
    >>> y, state = bn(params, state, jnp.ones((4, 8)), train=True)
    >>> y.shape
    (4, 8)
    """

    def __init__(self, input_size, dim=-1, gamma_init=1.0, beta_param=True,
                 momentum=0.1, eps=1e-4, track_running_stats=True):
        check_quaternion_input((input_size,))
        if dim != -1:
            raise ValueError("QBatchNorm supports dim=-1 (the reference "
                             "default; its chunk() uses the same axis)")
        self.num_features = input_size // 4
        self.gamma_init = gamma_init
        self.beta_param = beta_param
        self.momentum = momentum
        self.eps = eps
        self.track_running_stats = track_running_stats

    def init(self, rng):
        del rng
        return {"gamma": jnp.full((self.num_features,), self.gamma_init),
                "beta": jnp.zeros((4 * self.num_features,))}

    def init_state(self):
        state = {"num_batches_tracked": jnp.zeros((), jnp.int32)}
        if self.track_running_stats:
            state["running_mean"] = jnp.zeros((4 * self.num_features,))
            state["running_var"] = jnp.ones((self.num_features,))
        return state

    def __call__(self, params, state, x, train=False):
        new_state = dict(state)
        if train:
            n = state["num_batches_tracked"] + 1
            new_state["num_batches_tracked"] = n
            if self.momentum is None:
                f = 1.0 / n.astype(jnp.float32)
            else:
                f = self.momentum
            mu = jnp.mean(x, axis=0)
            delta = x - mu
            dr, di, dj, dk = split_quaternion(delta)
            quat_var = jnp.mean(dr ** 2 + di ** 2 + dj ** 2 + dk ** 2,
                                axis=0)
            denom = jnp.sqrt(quat_var + self.eps)
            out = x / jnp.concatenate([denom] * 4, axis=-1)
            if self.track_running_stats:
                # the reference's mu.view(running_mean.size()) crashes on
                # >2-D inputs; averaging the leading axes is the evident
                # intent (equal on 2-D, where view == identity)
                mu_flat = mu.reshape(-1, 4 * self.num_features).mean(0)
                var_flat = quat_var.reshape(-1, self.num_features).mean(0)
                new_state["running_mean"] = ((1 - f) * state["running_mean"]
                                             + f * mu_flat)
                new_state["running_var"] = ((1 - f) * state["running_var"]
                                            + f * var_flat)
        else:
            q_var = jnp.concatenate([state["running_var"]] * 4, axis=-1)
            out = (x - state["running_mean"]) / q_var
        q_gamma = jnp.concatenate([params["gamma"]] * 4, axis=-1)
        return q_gamma * out + params["beta"], new_state


# --- recurrent layers (reference ``q_RNN.py``) -----------------------------

class _QRNNBase(Module):
    """Shared machinery for the reference's quaternion recurrences: fused
    w/u projections shared across directions (bidirectional doubles the
    batch with a flipped copy), contiguous gate slices, zero initial
    state, per-row dropout masks shared across time. The wrappers ALWAYS
    return ``(output, h)`` — the reference has no return_hidden flag."""

    GATE_NEURONS = 1
    PROJ_BIAS = False

    def __init__(self, hidden_size, input_shape=None, input_size=None,
                 num_layers=1, bias=True, dropout=0.0, bidirectional=False,
                 init_criterion="glorot", weight_init="quaternion",
                 autograd=True):
        if input_size is None and input_shape is not None:
            input_size = int(np.prod(input_shape[2:]))
        check_quaternion_input((input_size,))
        self.hidden_size = hidden_size  # quaternion units
        self.input_size = input_size
        self.num_layers = num_layers
        self.bias = bias
        self.dropout = dropout
        self.bidirectional = bidirectional
        self.init_criterion = init_criterion
        self.weight_init = weight_init

    def _layer_modules(self, layer):
        in_size = (self.input_size if layer == 0 else
                   4 * self.hidden_size * (2 if self.bidirectional else 1))
        kw = dict(bias=self.PROJ_BIAS, init_criterion=self.init_criterion,
                  weight_init=self.weight_init)
        w = QLinear(self.GATE_NEURONS * self.hidden_size,
                    input_size=in_size, **kw)
        u = QLinear(self.GATE_NEURONS * self.hidden_size,
                    input_size=4 * self.hidden_size, **kw)
        return w, u

    def init(self, rng):
        params = {}
        keys = split_rngs(rng, 2 * self.num_layers)
        for layer in range(self.num_layers):
            w, u = self._layer_modules(layer)
            params[f"l{layer}"] = {"w": w.init(keys[2 * layer]),
                                   "u": u.init(keys[2 * layer + 1])}
        return params

    def _drop_mask(self, rng, batch, train):
        if not train or self.dropout == 0.0 or rng is None:
            return jnp.ones((1, 4 * self.hidden_size))
        keep = 1.0 - self.dropout
        mask = jax.random.bernoulli(rng, keep, (batch, 4 * self.hidden_size))
        return mask.astype(jnp.float32) / keep

    def _post_w(self, layer, p, w, train, state):
        return w, state

    def _layer_forward(self, layer, p, x, hx, train, rng, state=None):
        w_mod, u_mod = self._layer_modules(layer)
        if self.bidirectional:
            x = jnp.concatenate([x, jnp.flip(x, axis=1)], axis=0)
        w = w_mod(p["w"], x)
        w, new_state = self._post_w(layer, p, w, train, state)
        h0 = jnp.zeros((x.shape[0], 4 * self.hidden_size)) if hx is None \
            else jnp.broadcast_to(hx, (x.shape[0], 4 * self.hidden_size))
        drop_mask = self._drop_mask(rng, x.shape[0], train)
        h = self._scan_cell(lambda ht: u_mod(p["u"], ht), p, w, h0, drop_mask)
        if self.bidirectional:
            h_f, h_b = jnp.split(h, 2, axis=0)
            h = jnp.concatenate([h_f, jnp.flip(h_b, axis=1)], axis=2)
        return h, new_state

    def _forward(self, params, x, hx=None, train=False, rng=None,
                 states=None):
        if x.ndim == 4:
            x = x.reshape(x.shape[0], x.shape[1], -1)
        if hx is not None and self.bidirectional:
            hx = hx.reshape(self.num_layers, -1, 4 * self.hidden_size)
        h_last = []
        new_states = {} if states is not None else None
        for layer in range(self.num_layers):
            lkey = None if rng is None else jax.random.fold_in(rng, layer)
            lstate = None if states is None else states.get(f"l{layer}")
            x, lstate = self._layer_forward(
                layer, params[f"l{layer}"], x,
                None if hx is None else hx[layer], train, lkey, lstate)
            if new_states is not None:
                new_states[f"l{layer}"] = lstate
            h_last.append(x[:, -1, :])
        h = jnp.stack(h_last, axis=1)
        if self.bidirectional:
            h = h.reshape(h.shape[1] * 2, h.shape[0], 4 * self.hidden_size)
        else:
            h = jnp.swapaxes(h, 0, 1)
        return x, h, new_states

    def __call__(self, params, x, hx=None, train=False, rng=None):
        out, h, _ = self._forward(params, x, hx=hx, train=train, rng=rng)
        return out, h


class QRNN(_QRNNBase):
    """Vanilla quaternion RNN, reference-exact (reference ``q_RNN.py:QRNN``):
    ``h_t = act(w x_t + u h_{t-1}) * drop_mask``. Returns ``(out, h)``.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> rnn = QRNN(hidden_size=2, input_size=8)
    >>> params = rnn.init(jax.random.PRNGKey(0))
    >>> out, h = rnn(params, jnp.ones((2, 10, 8)))
    >>> out.shape
    (2, 10, 8)
    """

    GATE_NEURONS = 1
    PROJ_BIAS = False

    def __init__(self, hidden_size, input_shape=None, input_size=None,
                 nonlinearity="tanh", num_layers=1, bias=True, dropout=0.0,
                 bidirectional=False, init_criterion="glorot",
                 weight_init="quaternion", autograd=True):
        super().__init__(hidden_size, input_shape, input_size, num_layers,
                         bias, dropout, bidirectional, init_criterion,
                         weight_init)
        self.act = jnp.tanh if nonlinearity == "tanh" else jax.nn.relu

    def _scan_cell(self, u, p, w_seq, h0, drop_mask):
        def step(ht, w_t):
            h_new = self.act(w_t + u(ht)) * drop_mask
            return h_new, h_new

        _, outs = jax.lax.scan(step, h0, jnp.moveaxis(w_seq, 1, 0))
        return jnp.moveaxis(outs, 0, 1)


class QLSTM(_QRNNBase):
    """Quaternion LSTM, reference-exact (reference ``q_RNN.py:QLSTM``):
    chunk(16)+cat gate split == contiguous (i, f, o, c~) slices of width 4H.
    ``c_t = i*tanh(c~)*drop + f*c`` ; ``h_t = o*tanh(c_t)``. Returns
    ``(out, h)``.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> lstm = QLSTM(hidden_size=2, input_size=8)
    >>> params = lstm.init(jax.random.PRNGKey(0))
    >>> out, h = lstm(params, jnp.ones((2, 7, 8)))
    >>> out.shape
    (2, 7, 8)
    """

    GATE_NEURONS = 4
    PROJ_BIAS = True

    def _scan_cell(self, u, p, w_seq, h0, drop_mask):
        c0 = jnp.zeros_like(h0)
        four_h = 4 * self.hidden_size

        def step(carry, w_t):
            ht, ct = carry
            gates = w_t + u(ht)
            it = jax.nn.sigmoid(gates[:, :four_h])
            ft = jax.nn.sigmoid(gates[:, four_h:2 * four_h])
            ot = jax.nn.sigmoid(gates[:, 2 * four_h:3 * four_h])
            ctilde = jnp.tanh(gates[:, 3 * four_h:])
            c_new = it * ctilde * drop_mask + ft * ct
            h_new = ot * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        _, outs = jax.lax.scan(step, (h0, c0), jnp.moveaxis(w_seq, 1, 0))
        return jnp.moveaxis(outs, 0, 1)


class QLiGRU(_QRNNBase):
    """Quaternion light GRU, reference-exact (reference ``q_RNN.py:QLiGRU``):
    contiguous (a, z) gate slices; ``h_t = z*h + (1-z)*act(a)*drop`` with
    leaky_relu by default. ``batchnorm`` normalizes the flattened
    feed-forward projection with the stateful QBatchNorm; ANY other
    normalization string applies nothing (unlike the complex CLiGRU).
    Returns ``((out, h), new_state)``.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> gru = QLiGRU(hidden_size=2, input_size=8)
    >>> params, state = gru.init(jax.random.PRNGKey(0)), gru.init_state()
    >>> (out, h), state = gru(params, state, jnp.ones((2, 7, 8)))
    >>> out.shape
    (2, 7, 8)
    """

    GATE_NEURONS = 2
    PROJ_BIAS = False

    def __init__(self, hidden_size, input_shape=None, input_size=None,
                 nonlinearity="leaky_relu", normalization="batchnorm",
                 num_layers=1, bias=True, dropout=0.0, bidirectional=False,
                 init_criterion="glorot", weight_init="quaternion",
                 autograd=True):
        super().__init__(hidden_size, input_shape, input_size, num_layers,
                         bias, dropout, bidirectional, init_criterion,
                         weight_init)
        self.act = {"tanh": jnp.tanh,
                    "leaky_relu": jax.nn.leaky_relu}.get(nonlinearity,
                                                         jax.nn.relu)
        self.normalization = normalization
        self.normalize = normalization == "batchnorm"
        self.norm = QBatchNorm(input_size=8 * hidden_size, dim=-1)

    def init(self, rng):
        params = super().init(rng)
        if self.normalize:
            for layer in range(self.num_layers):
                params[f"l{layer}"]["norm"] = self.norm.init(None)
        return params

    def init_state(self):
        return {f"l{layer}": (self.norm.init_state() if self.normalize
                              else {})
                for layer in range(self.num_layers)}

    def _post_w(self, layer, p, w, train, state):
        if not self.normalize:
            return w, state
        flat = w.reshape(-1, w.shape[-1])
        flat, new_state = self.norm(p["norm"], state, flat, train=train)
        return flat.reshape(w.shape), new_state

    def _scan_cell(self, u, p, w_seq, h0, drop_mask):
        four_h = 4 * self.hidden_size

        def step(ht, w_t):
            gates = w_t + u(ht)
            at, zt = gates[:, :four_h], gates[:, four_h:]
            zt = jax.nn.sigmoid(zt)
            hcand = self.act(at) * drop_mask
            h_new = zt * ht + (1 - zt) * hcand
            return h_new, h_new

        _, outs = jax.lax.scan(step, h0, jnp.moveaxis(w_seq, 1, 0))
        return jnp.moveaxis(outs, 0, 1)

    def __call__(self, params, state, x, hx=None, train=False, rng=None):
        out, h, new_states = self._forward(params, x, hx=hx, train=train,
                                           rng=rng, states=state)
        return (out, h), new_states


QRNN_Layer = QRNN
QLSTM_Layer = QLSTM
QLiGRU_Layer = QLiGRU


# --- reference ``q_ops.py`` public helpers -------------------------------

def unitary_init(rng, in_features, out_features, criterion="he"):
    """Unit-quaternion init (reference ``q_ops.py:unitary_init``): i.i.d.
    uniform components normalized to unit norm."""
    del criterion
    k = jax.random.uniform(rng, (4, in_features, out_features),
                           minval=-1.0, maxval=1.0)
    norm = jnp.sqrt(jnp.sum(jnp.square(k), axis=0, keepdims=True)) + 1e-4
    k = k / norm
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
    """Functional quaternion convolution with the W ⊗ x Hamilton layout
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
    yi = ci(xr) + cr(xi) - ck(xj) + cj(xk)
    yj = cj(xr) + ck(xi) + cr(xj) - ci(xk)
    yk = ck(xr) - cj(xi) + ci(xj) + cr(xk)
    y = jnp.concatenate([yr, yi, yj, yk], axis=-1)
    if bias is not None:
        y = y + bias
    return y


def _rotation_coeffs(wr, wi, wj, wk, eps_inside):
    """Rotation-matrix entries of the normalized quaternion weights.
    ``eps_inside`` selects the reference's two norm conventions: the conv
    op adds 1e-4 INSIDE the sqrt (q_ops.py:423), the linear op OUTSIDE
    (q_ops.py:281)."""
    sq = wr ** 2 + wi ** 2 + wj ** 2 + wk ** 2
    if eps_inside:
        n = jnp.sqrt(sq + 1e-4)
    else:
        n = jnp.sqrt(sq) + 1e-4
    r, i, j, k = wr / n, wi / n, wj / n, wk / n
    sq_i, sq_j, sq_k = 2 * i * i, 2 * j * j, 2 * k * k
    ri, rj, rk = 2 * r * i, 2 * r * j, 2 * r * k
    ij, ik, jk = 2 * i * j, 2 * i * k, 2 * j * k
    row1 = (1 - (sq_j + sq_k), ij - rk, ik + rj)
    row2 = (ij + rk, 1 - (sq_i + sq_k), jk - ri)
    row3 = (ik - rj, jk + ri, 1 - (sq_i + sq_j))
    return row1, row2, row3


def quaternion_linear_rotation_op(x, wr, wi, wj, wk, bias=None, scale=None):
    """Rotation-parameterized quaternion linear op (reference
    ``q_ops.py:quaternion_linear_rotation_op``): the 3-D vector part of the
    input is rotated by the unit quaternion of each weight. The reference's
    kernel indexes rows by INPUT component, i.e. ``y = x @ Rᵀ`` relative to
    the conv orientation."""
    _, xi, xj, xk = split_quaternion(x)
    (a1, a2, a3), (b1, b2, b3), (c1, c2, c3) = _rotation_coeffs(
        wr, wi, wj, wk, eps_inside=False)
    if scale is not None:
        a1, a2, a3 = scale * a1, scale * a2, scale * a3
        b1, b2, b3 = scale * b1, scale * b2, scale * b3
        c1, c2, c3 = scale * c1, scale * c2, scale * c3
    # input-indexed rows: xi carries row1, xj row2, xk row3; output col N
    # collects the N-th entry of each row (q_ops.py:305-345)
    yi = xi @ a1 + xj @ b1 + xk @ c1
    yj = xi @ a2 + xj @ b2 + xk @ c2
    yk = xi @ a3 + xj @ b3 + xk @ c3
    yr = jnp.zeros(x.shape[:-1] + (wr.shape[-1],), x.dtype)
    y = jnp.concatenate([yr, yi, yj, yk], axis=-1)
    if bias is not None:
        y = y + bias
    return y


def quaternion_conv_rotation_op(x, wr, wi, wj, wk, bias=None, scale=None,
                                stride=1, padding="same", dilation=1,
                                conv1d=True):
    """Conv variant of the rotation op (reference
    ``q_ops.py:quaternion_conv_rotation_op``): output-indexed rotation
    kernels, norm eps inside the sqrt."""
    from svt_speechbrain_tpu.nnet.cnn import Conv1d, Conv2d

    cls = Conv1d if conv1d else Conv2d
    out_ch, in_ch, k = wr.shape[-1], wr.shape[-2], wr.shape[:-2]
    conv = cls(out_ch, k if len(k) > 1 else k[0], in_ch, stride=stride,
               dilation=dilation, padding=padding, bias=False)
    rows = _rotation_coeffs(wr, wi, wj, wk, eps_inside=True)
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
