"""Complex-valued neural networks, reference-exact
(reference ``speechbrain/nnet/complex_networks/`` ~2.8k LoC: ``c_ops.py``,
``c_linear.py``, ``c_CNN.py``, ``c_normalization.py``, ``c_RNN.py``).

Representation convention follows the reference: a complex tensor of width
2N is stored as ``[real_0..real_{N-1}, imag_0..imag_{N-1}]`` along the last
axis. Ops implement the complex product

    (a + ib)(c + id) = (ac - bd) + i(ad + bc)

as two real MXU matmuls over stacked weight matrices.

Reference quirks mirrored exactly (golden-tested in
``tests/test_complex_golden.py``):

- The recurrent layers (``c_RNN.py``) slice their fused gate projections
  CONTIGUOUSLY: e.g. CLSTM's ``gates.chunk(8, 1)`` + pairwise cat makes the
  input gate the first 2H real lanes of the packed output — the REAL parts
  of complex units 0..2H — so the gates cut across the complex packing
  rather than pairing each unit's real/imag lanes. We reproduce the
  contiguous slicing bit for bit.
- ``CBatchNorm`` adds ``eps`` to the Vrr/Vii batch moments BEFORE the
  running-average update, so the moving covariances accumulate
  eps-inflated values (``c_normalization.py:209-226``); the eval path then
  whitens with NO further eps.
- ``CLayerNorm`` on a 2-D input reduces over NO axes (``c_normalization.py
  :414-416`` deletes both the feature and batch axes from the reduction
  list), so ``mu == input`` and the whole output collapses to ``beta``.
  ``CLiGRU`` flattens (B, T, C) to (B*T, C) before normalizing, so its
  ``layernorm`` mode — and its "any other string" fallback, which also
  instantiates CLayerNorm with ``normalize=True`` (``c_RNN.py:1046-1053``)
  — zeroes the feed-forward projection entirely. Only ``batchnorm`` is
  functional; we mirror all three.
- Reference ``CLinear(bias=True)`` never initializes its bias tensor
  (``c_linear.py:96`` allocates uninitialized memory and ``affect_init``
  only fills weights); ours zero-initializes — the evident intent.
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
    """Complex polar-form init (reference ``c_ops.py:complex_init``):
    modulus ~ Rayleigh(s), phase ~ U(-pi, pi), s = 1/(fan_in+fan_out)
    for glorot or 1/fan_in for he."""
    if criterion == "glorot":
        s = 1.0 / (in_features + out_features)
    else:
        s = 1.0 / in_features
    k1, k2 = jax.random.split(rng)
    # Rayleigh(s) via inverse-CDF of a uniform
    modulus = s * jnp.sqrt(-2.0 * jnp.log(
        jax.random.uniform(k1, (in_features, out_features), minval=1e-7, maxval=1.0)))
    phase = jax.random.uniform(k2, (in_features, out_features),
                               minval=-np.pi, maxval=np.pi)
    return modulus * jnp.cos(phase), modulus * jnp.sin(phase)


def complex_linear_op(x, real_weight, imag_weight, bias=None):
    """Complex matmul over the packed representation
    (reference ``c_ops.py:complex_linear_op``).

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
    """Complex linear layer (reference ``c_linear.py:CLinear``).
    ``n_neurons`` counts complex units (output width = 2*n_neurons).

    With ``bias=False`` the reference keeps a non-grad bias tensor that
    ``complex_linear_op`` skips (``c_ops.py:135``); ours simply omits it.

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
        self.weight_init = weight_init

    def init(self, rng):
        wkey, _ = split_rngs(rng, 2)
        init_fn = {"complex": complex_init, "unitary": unitary_init}[
            self.weight_init]
        wr, wi = init_fn(wkey, self.in_complex, self.n_neurons,
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
    (reference ``c_CNN.py:CConv1d``): reflect same-padding by default,
    torch-layout complex kernels expressed as two real convs.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> conv = CConv1d(out_channels=6, kernel_size=3, input_size=8)
    >>> params = conv.init(jax.random.PRNGKey(0))
    >>> conv(params, jnp.ones((2, 16, 8))).shape
    (2, 16, 12)
    """

    def __init__(self, out_channels, kernel_size, input_shape=None, input_size=None,
                 stride=1, dilation=1, padding="same", bias=True,
                 padding_mode="reflect", init_criterion="glorot",
                 weight_init="complex"):
        if input_size is None and input_shape is not None:
            input_size = input_shape[-1]
        check_complex_input((input_size,))
        if kernel_size % 2 == 0:
            raise ValueError("The field kernel size must be an odd number. "
                             f"Got {kernel_size}.")
        from svt_speechbrain_tpu.nnet.cnn import Conv1d

        self.in_complex = input_size // 2
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        if padding == "causal":
            # reference c_CNN.py:146: causal always zero-pads (plain F.pad);
            # padding_mode only applies to "same"
            padding_mode = "zeros"
        self.conv_r = Conv1d(out_channels, kernel_size, self.in_complex,
                             stride=stride, dilation=dilation, padding=padding,
                             padding_mode=padding_mode, bias=False)
        self.conv_i = Conv1d(out_channels, kernel_size, self.in_complex,
                             stride=stride, dilation=dilation, padding=padding,
                             padding_mode=padding_mode, bias=False)
        self.bias = bias
        self.init_criterion = init_criterion
        self.weight_init = weight_init

    def init(self, rng):
        k1, _ = split_rngs(rng, 2)
        init_fn = {"complex": complex_init, "unitary": unitary_init}[
            self.weight_init]
        wr, wi = init_fn(k1, self.in_complex * self.kernel_size,
                         self.out_channels, self.init_criterion)
        shape = (self.kernel_size, self.in_complex, self.out_channels)
        params = {"real": {"w": wr.reshape(shape)},
                  "imag": {"w": wi.reshape(shape)}}
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


class CConv2d(Module):
    """Complex 2-D convolution over (batch, time, feature, 2C)
    (reference ``c_CNN.py:CConv2d``). The reference applies ``kernel_size
    [0]`` along the FEATURE axis and ``kernel_size[1]`` along TIME
    (its transpose(1, -1) maps channels-last (B,T,F,C) to (B,C,F,T)); we
    swap the per-axis kernel/stride/dilation to match.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> conv = CConv2d(out_channels=4, kernel_size=3, input_size=6)
    >>> params = conv.init(jax.random.PRNGKey(0))
    >>> conv(params, jnp.ones((2, 10, 12, 6))).shape
    (2, 10, 12, 8)
    """

    def __init__(self, out_channels, kernel_size, input_shape=None,
                 input_size=None, stride=1, dilation=1, padding="same",
                 bias=True, padding_mode="reflect", init_criterion="glorot",
                 weight_init="complex"):
        if input_size is None and input_shape is not None:
            input_size = input_shape[-1]
        check_complex_input((input_size,))
        from svt_speechbrain_tpu.nnet.cnn import Conv2d

        def pair(v):
            return (v, v) if isinstance(v, int) else tuple(v)

        self.k = pair(kernel_size)
        if self.k[0] % 2 == 0 or self.k[1] % 2 == 0:
            raise ValueError("The field kernel size must be an odd number. "
                             f"Got {self.k}.")
        s, d = pair(stride), pair(dilation)
        self.in_complex = input_size // 2
        self.out_channels = out_channels
        # reference axis mapping: k[0]→feature, k[1]→time; our Conv2d input
        # is (B, time, feature, C) = (N, H, W, C), so swap the pairs
        kw = {"stride": (s[1], s[0]), "dilation": (d[1], d[0]),
              "padding": padding, "padding_mode": padding_mode, "bias": False}
        self.conv_r = Conv2d(out_channels, (self.k[1], self.k[0]),
                             self.in_complex, **kw)
        self.conv_i = Conv2d(out_channels, (self.k[1], self.k[0]),
                             self.in_complex, **kw)
        self.bias = bias
        self.init_criterion = init_criterion
        self.weight_init = weight_init

    def init(self, rng):
        k1, _ = split_rngs(rng, 2)
        init_fn = {"complex": complex_init, "unitary": unitary_init}[
            self.weight_init]
        receptive = self.k[0] * self.k[1]
        wr, wi = init_fn(k1, self.in_complex * receptive, self.out_channels,
                         self.init_criterion)
        shape = (self.k[1], self.k[0], self.in_complex, self.out_channels)
        params = {"real": {"w": wr.reshape(shape)},
                  "imag": {"w": wi.reshape(shape)}}
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


# --- normalization (reference ``c_normalization.py``) ---------------------

def _split_halves(x, dim):
    half = x.shape[dim] // 2
    idx_r = [slice(None)] * x.ndim
    idx_i = [slice(None)] * x.ndim
    idx_r[dim] = slice(0, half)
    idx_i[dim] = slice(half, None)
    return x[tuple(idx_r)], x[tuple(idx_i)]


def c_standardization(input_centred, Vrr, Vii, Vri, layernorm=False, dim=-1):
    """Whiten a centred packed-complex tensor by the inverse square root of
    its 2×2 real/imag covariance (reference ``c_normalization.py:630``):
    with V = [[Vrr, Vri], [Vri, Vii]], y = V^{-1/2} x computed in closed
    form via trace/determinant. No eps here — the callers bake it into
    Vrr/Vii, exactly like the reference."""
    tau = Vrr + Vii
    delta = Vrr * Vii - Vri ** 2
    s = jnp.sqrt(delta)
    t = jnp.sqrt(tau + 2 * s)
    inverse_st = 1.0 / (s * t)
    Wrr = (Vii + s) * inverse_st
    Wii = (Vrr + s) * inverse_st
    Wri = -Vri * inverse_st
    xr, xi = _split_halves(input_centred, dim)
    return jnp.concatenate([Wrr * xr + Wri * xi, Wri * xr + Wii * xi],
                           axis=dim)


def c_norm(input_centred, Vrr, Vii, Vri, beta=None, gamma_rr=None,
           gamma_ri=None, gamma_ii=None, scale=True, center=True,
           layernorm=False, dim=-1):
    """Complex normalization (reference ``c_normalization.py:499``):
    whitening plus the complex affine transform with the
    [[γ_rr, γ_ri], [γ_ri, γ_ii]] scale matrix and β shift."""
    if scale:
        out = c_standardization(input_centred, Vrr, Vii, Vri,
                                layernorm=layernorm, dim=dim)
        xr, xi = _split_halves(out, dim)
        out = jnp.concatenate([gamma_rr * xr + gamma_ri * xi,
                               gamma_ri * xr + gamma_ii * xi], axis=dim)
        if center:
            out = out + beta
        return out
    if center:
        return input_centred + beta
    return input_centred


class CBatchNorm(Module):
    """Complex batch norm with full 2×2 covariance whitening, reference-
    exact (reference ``c_normalization.py:CBatchNorm``; "Deep Complex
    Networks", Trabelsi et al.).

    Stateful: running (Vrr, Vii, Vri, mean) follow torch-momentum updates
    ``new = (1-m)*old + m*batch`` with eps already folded into the batch
    Vrr/Vii (reference quirk), or a cumulative average when
    ``momentum=None``. Train mode whitens with batch moments; eval mode
    with the running moments.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> bn = CBatchNorm(input_size=6)
    >>> params, state = bn.init(jax.random.PRNGKey(0)), bn.init_state()
    >>> y, state = bn(params, state, jnp.ones((4, 5, 6)), train=True)
    >>> y.shape
    (4, 5, 6)
    """

    def __init__(self, input_size=None, input_shape=None, dim=-1, eps=1e-4,
                 momentum=0.1, scale=True, center=True,
                 track_running_stats=True):
        if input_size is None and input_shape is not None:
            input_size = input_shape[dim]
        check_complex_input((input_size,))
        self.num_complex = input_size // 2
        self.dim = dim
        self.eps = eps
        self.momentum = momentum
        self.scale = scale
        self.center = center
        self.track_running_stats = track_running_stats

    def init(self, rng):
        del rng
        params = {}
        if self.scale:
            params["gamma_rr"] = jnp.full((self.num_complex,), 1 / np.sqrt(2))
            params["gamma_ii"] = jnp.full((self.num_complex,), 1 / np.sqrt(2))
            params["gamma_ri"] = jnp.zeros((self.num_complex,))
        if self.center:
            params["beta"] = jnp.zeros((2 * self.num_complex,))
        return params

    def init_state(self):
        state = {"num_batches_tracked": jnp.zeros((), jnp.int32)}
        if self.track_running_stats:
            if self.scale:
                state["moving_Vrr"] = jnp.full((self.num_complex,),
                                               np.sqrt(1 / 2))
                state["moving_Vii"] = jnp.full((self.num_complex,),
                                               np.sqrt(1 / 2))
                state["moving_Vri"] = jnp.zeros((self.num_complex,))
            if self.center:
                state["moving_mean"] = jnp.zeros((2 * self.num_complex,))
        return state

    def _moments(self, x, reduction_axes, dim):
        mu = jnp.mean(x, axis=reduction_axes, keepdims=True)
        centred = x - mu
        Vrr = Vii = Vri = None
        if self.scale:
            sq_r, sq_i = _split_halves(centred ** 2, dim)
            c_r, c_i = _split_halves(centred, dim)
            Vrr = jnp.mean(sq_r, axis=reduction_axes, keepdims=True) + self.eps
            Vii = jnp.mean(sq_i, axis=reduction_axes, keepdims=True) + self.eps
            Vri = jnp.mean(c_r * c_i, axis=reduction_axes, keepdims=True)
        return mu, centred, Vrr, Vii, Vri

    def __call__(self, params, state, x, train=False):
        dim = self.dim if self.dim >= 0 else x.ndim + self.dim
        reduction_axes = tuple(a for a in range(x.ndim) if a != dim)
        mu, centred, Vrr, Vii, Vri = self._moments(x, reduction_axes, dim)

        new_state = dict(state)
        if train and self.track_running_stats:
            n = state["num_batches_tracked"] + 1
            new_state["num_batches_tracked"] = n
            if self.momentum is None:
                f = 1.0 / n.astype(jnp.float32)
            else:
                f = self.momentum
            if self.center:
                new_state["moving_mean"] = (
                    (1 - f) * state["moving_mean"]
                    + f * mu.reshape(state["moving_mean"].shape))
            if self.scale:
                for name, v in (("moving_Vrr", Vrr), ("moving_Vii", Vii),
                                ("moving_Vri", Vri)):
                    new_state[name] = ((1 - f) * state[name]
                                       + f * v.reshape(state[name].shape))

        stat_shape = [1] * x.ndim
        stat_shape[dim] = self.num_complex
        if train or not self.track_running_stats:
            inferred = centred if self.center else x
            use = (Vrr, Vii, Vri)
        else:
            if self.center:
                inferred = x - state["moving_mean"].reshape(
                    stat_shape[:dim] + [2 * self.num_complex]
                    + stat_shape[dim + 1:])
            else:
                inferred = x
            use = tuple(state[k].reshape(stat_shape) if self.scale else None
                        for k in ("moving_Vrr", "moving_Vii", "moving_Vri"))
        out = c_norm(inferred, *use, beta=params.get("beta"),
                     gamma_rr=params.get("gamma_rr"),
                     gamma_ri=params.get("gamma_ri"),
                     gamma_ii=params.get("gamma_ii"),
                     scale=self.scale, center=self.center, dim=dim)
        return out, new_state


class CLayerNorm(Module):
    """Complex layer norm with full whitening, reference-exact (reference
    ``c_normalization.py:CLayerNorm``): per-sample moments over every axis
    except batch and the feature axis.

    Reference quirk mirrored: on a 2-D input the reduction-axis list
    becomes EMPTY, ``mu == input`` and the output collapses to ``beta``
    (see module docstring — this is what ``CLiGRU``'s layernorm mode
    feeds).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> ln = CLayerNorm(6)
    >>> y = ln(ln.init(None), jnp.ones((2, 5, 6)))
    >>> y.shape
    (2, 5, 6)
    """

    def __init__(self, input_size=None, input_shape=None, dim=-1, eps=1e-4,
                 scale=True, center=True):
        if input_size is None and input_shape is not None:
            input_size = input_shape[dim]
        check_complex_input((input_size,))
        self.num_complex = input_size // 2
        self.dim = dim
        self.eps = eps
        self.scale = scale
        self.center = center

    def init(self, rng):
        del rng
        params = {}
        if self.scale:
            params["gamma_rr"] = jnp.full((self.num_complex,), 1 / np.sqrt(2))
            params["gamma_ii"] = jnp.full((self.num_complex,), 1 / np.sqrt(2))
            params["gamma_ri"] = jnp.zeros((self.num_complex,))
        if self.center:
            params["beta"] = jnp.zeros((2 * self.num_complex,))
        return params

    def __call__(self, params, x):
        dim = self.dim if self.dim >= 0 else x.ndim + self.dim
        reduction_axes = tuple(a for a in range(x.ndim)
                               if a != dim and a != 0)
        if reduction_axes:
            mu = jnp.mean(x, axis=reduction_axes, keepdims=True)
        else:
            mu = x  # 2-D degenerate path: mean over no axes is the identity
        centred = x - mu if self.center else x
        Vrr = Vii = Vri = None
        if self.scale:
            sq_r, sq_i = _split_halves(centred ** 2, dim)
            c_r, c_i = _split_halves(centred, dim)
            if reduction_axes:
                Vrr = jnp.mean(sq_r, axis=reduction_axes,
                               keepdims=True) + self.eps
                Vii = jnp.mean(sq_i, axis=reduction_axes,
                               keepdims=True) + self.eps
                Vri = jnp.mean(c_r * c_i, axis=reduction_axes, keepdims=True)
            else:
                Vrr, Vii, Vri = sq_r + self.eps, sq_i + self.eps, c_r * c_i
        return c_norm(centred, Vrr, Vii, Vri, beta=params.get("beta"),
                      gamma_rr=params.get("gamma_rr"),
                      gamma_ri=params.get("gamma_ri"),
                      gamma_ii=params.get("gamma_ii"),
                      scale=self.scale, center=self.center, layernorm=True,
                      dim=dim)


# --- recurrent layers (reference ``c_RNN.py``) -----------------------------

class _CRNNBase(Module):
    """Shared machinery for the reference's complex recurrences: one fused
    input projection ``w`` and one fused recurrent projection ``u`` per
    layer (shared across directions — bidirectional runs the flipped copy
    in the same doubled batch, ``c_RNN.py:280``), contiguous gate slices,
    zero initial state, per-row dropout masks shared across time."""

    GATE_NEURONS = 1      # complex n_neurons of w/u per hidden unit
    PROJ_BIAS = False

    def __init__(self, hidden_size, input_shape=None, input_size=None,
                 num_layers=1, bias=True, dropout=0.0, bidirectional=False,
                 return_hidden=False, init_criterion="glorot",
                 weight_init="complex"):
        if input_size is None and input_shape is not None:
            input_size = int(np.prod(input_shape[2:]))
        check_complex_input((input_size,))
        self.hidden_size = hidden_size  # complex units
        self.input_size = input_size
        self.num_layers = num_layers
        self.bias = bias
        self.dropout = dropout
        self.bidirectional = bidirectional
        self.return_hidden = return_hidden
        self.init_criterion = init_criterion
        self.weight_init = weight_init

    def _layer_sizes(self, layer):
        in_size = (self.input_size if layer == 0 else
                   2 * self.hidden_size * (2 if self.bidirectional else 1))
        return in_size

    def _make_proj(self, in_size):
        return CLinear(self.GATE_NEURONS * self.hidden_size,
                       input_size=in_size, bias=self.PROJ_BIAS,
                       init_criterion=self.init_criterion,
                       weight_init=self.weight_init)

    def _layer_modules(self, layer):
        w = self._make_proj(self._layer_sizes(layer))
        u = self._make_proj(2 * self.hidden_size)
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
            return jnp.ones((1, 2 * self.hidden_size))
        keep = 1.0 - self.dropout
        mask = jax.random.bernoulli(rng, keep, (batch, 2 * self.hidden_size))
        return mask.astype(jnp.float32) / keep

    def _scan_cell(self, u, p, w_seq, h0, drop_mask, extra0=None):
        """Run the recurrence with lax.scan over time-major ``w_seq``."""
        raise NotImplementedError

    def _layer_forward(self, layer, p, x, hx, train, rng, state=None):
        w_mod, u_mod = self._layer_modules(layer)
        if self.bidirectional:
            x = jnp.concatenate([x, jnp.flip(x, axis=1)], axis=0)
        w = w_mod(p["w"], x)
        w, new_state = self._post_w(layer, p, w, train, state)
        h0 = jnp.zeros((x.shape[0], 2 * self.hidden_size)) if hx is None \
            else jnp.broadcast_to(hx, (x.shape[0], 2 * self.hidden_size))
        drop_mask = self._drop_mask(rng, x.shape[0], train)
        h = self._scan_cell(lambda ht: u_mod(p["u"], ht), p, w, h0, drop_mask)
        if self.bidirectional:
            h_f, h_b = jnp.split(h, 2, axis=0)
            h = jnp.concatenate([h_f, jnp.flip(h_b, axis=1)], axis=2)
        return h, new_state

    def _post_w(self, layer, p, w, train, state):
        return w, state

    def _forward(self, params, x, hx=None, train=False, rng=None,
                 states=None):
        if x.ndim == 4:
            x = x.reshape(x.shape[0], x.shape[1], -1)
        if hx is not None and self.bidirectional:
            hx = hx.reshape(self.num_layers, -1, 2 * self.hidden_size)
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
            h = h.reshape(h.shape[1] * 2, h.shape[0], 2 * self.hidden_size)
        else:
            h = jnp.swapaxes(h, 0, 1)
        return x, h, new_states

    def __call__(self, params, x, hx=None, train=False, rng=None):
        out, h, _ = self._forward(params, x, hx=hx, train=train, rng=rng)
        if self.return_hidden:
            return out, h
        return out


class CRNN(_CRNNBase):
    """Vanilla complex RNN, reference-exact (reference ``c_RNN.py:CRNN``):
    ``h_t = act(w x_t + u h_{t-1}) * drop_mask``, tanh or relu, bias-free
    fused projections.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> rnn = CRNN(hidden_size=5, input_size=8)
    >>> params = rnn.init(jax.random.PRNGKey(0))
    >>> rnn(params, jnp.ones((2, 10, 8))).shape
    (2, 10, 10)
    """

    GATE_NEURONS = 1
    PROJ_BIAS = False

    def __init__(self, hidden_size, input_shape=None, input_size=None,
                 nonlinearity="tanh", num_layers=1, bias=True, dropout=0.0,
                 bidirectional=False, return_hidden=False,
                 init_criterion="glorot", weight_init="complex"):
        super().__init__(hidden_size, input_shape, input_size, num_layers,
                         bias, dropout, bidirectional, return_hidden,
                         init_criterion, weight_init)
        self.act = jnp.tanh if nonlinearity == "tanh" else jax.nn.relu

    def _scan_cell(self, u, p, w_seq, h0, drop_mask):
        def step(ht, w_t):
            at = w_t + u(ht)
            h_new = self.act(at) * drop_mask
            return h_new, h_new

        _, outs = jax.lax.scan(step, h0, jnp.moveaxis(w_seq, 1, 0))
        return jnp.moveaxis(outs, 0, 1)


class CLSTM(_CRNNBase):
    """Complex LSTM, reference-exact (reference ``c_RNN.py:CLSTM``): one
    4H-complex-unit fused projection; the reference's chunk(8)+cat gate
    split is equivalent to slicing the packed output CONTIGUOUSLY into
    (i, f, o, c~) of width 2H each — gates cut across the complex packing.
    ``c_t = i*tanh(c~)*drop + f*c`` ; ``h_t = o*tanh(c_t)``.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> lstm = CLSTM(hidden_size=4, input_size=8)
    >>> params = lstm.init(jax.random.PRNGKey(0))
    >>> lstm(params, jnp.ones((2, 7, 8))).shape
    (2, 7, 8)
    """

    GATE_NEURONS = 4
    PROJ_BIAS = True

    def _scan_cell(self, u, p, w_seq, h0, drop_mask):
        c0 = jnp.zeros_like(h0)
        two_h = 2 * self.hidden_size

        def step(carry, w_t):
            ht, ct = carry
            gates = w_t + u(ht)
            it = jax.nn.sigmoid(gates[:, :two_h])
            ft = jax.nn.sigmoid(gates[:, two_h:2 * two_h])
            ot = jax.nn.sigmoid(gates[:, 2 * two_h:3 * two_h])
            ctilde = jnp.tanh(gates[:, 3 * two_h:])
            c_new = it * ctilde * drop_mask + ft * ct
            h_new = ot * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        _, outs = jax.lax.scan(step, (h0, c0), jnp.moveaxis(w_seq, 1, 0))
        return jnp.moveaxis(outs, 0, 1)


class CLiGRU(_CRNNBase):
    """Complex light GRU, reference-exact (reference ``c_RNN.py:CLiGRU``):
    2H-complex-unit fused projections sliced contiguously into (a, z);
    ``h_t = z*h + (1-z)*act(a)*drop``. The feed-forward projection is
    normalized over the flattened (B*T, 4H) view BEFORE the recurrence.

    Normalization modes mirror the reference exactly: ``batchnorm`` →
    CBatchNorm(momentum=0.05) (stateful — pass/receive ``state``);
    ``layernorm`` AND any other string → CLayerNorm, which on the 2-D
    flattened view collapses w to beta=0 (reference quirk, see module
    docstring).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> gru = CLiGRU(hidden_size=4, input_size=8)
    >>> params, state = gru.init(jax.random.PRNGKey(0)), gru.init_state()
    >>> out, state = gru(params, state, jnp.ones((2, 7, 8)))
    >>> out.shape
    (2, 7, 8)
    """

    GATE_NEURONS = 2
    PROJ_BIAS = False

    def __init__(self, hidden_size, input_shape=None, input_size=None,
                 nonlinearity="relu", normalization="batchnorm", num_layers=1,
                 bias=True, dropout=0.0, bidirectional=False,
                 return_hidden=False, init_criterion="glorot",
                 weight_init="complex"):
        super().__init__(hidden_size, input_shape, input_size, num_layers,
                         bias, dropout, bidirectional, return_hidden,
                         init_criterion, weight_init)
        self.act = jnp.tanh if nonlinearity == "tanh" else jax.nn.relu
        self.normalization = normalization
        norm_width = 4 * hidden_size
        if normalization == "batchnorm":
            self.norm = CBatchNorm(input_size=norm_width, dim=-1,
                                   momentum=0.05)
        else:
            # reference c_RNN.py:1046-1053: layernorm AND the "disabled"
            # fallback both apply CLayerNorm with normalize=True
            self.norm = CLayerNorm(input_size=norm_width, dim=-1)

    def init(self, rng):
        params = super().init(rng)
        for layer in range(self.num_layers):
            params[f"l{layer}"]["norm"] = self.norm.init(None)
        return params

    def init_state(self):
        if self.normalization == "batchnorm":
            return {f"l{layer}": self.norm.init_state()
                    for layer in range(self.num_layers)}
        return {f"l{layer}": {} for layer in range(self.num_layers)}

    def _post_w(self, layer, p, w, train, state):
        flat = w.reshape(-1, w.shape[-1])
        if self.normalization == "batchnorm":
            flat, new_state = self.norm(p["norm"], state, flat, train=train)
        else:
            flat, new_state = self.norm(p["norm"], flat), state
        return flat.reshape(w.shape), new_state

    def _scan_cell(self, u, p, w_seq, h0, drop_mask):
        two_h = 2 * self.hidden_size

        def step(ht, w_t):
            gates = w_t + u(ht)
            at, zt = gates[:, :two_h], gates[:, two_h:]
            zt = jax.nn.sigmoid(zt)
            hcand = self.act(at) * drop_mask
            h_new = zt * ht + (1 - zt) * hcand
            return h_new, h_new

        _, outs = jax.lax.scan(step, h0, jnp.moveaxis(w_seq, 1, 0))
        return jnp.moveaxis(outs, 0, 1)

    def __call__(self, params, state, x, hx=None, train=False, rng=None):
        out, h, new_states = self._forward(params, x, hx=hx, train=train,
                                           rng=rng, states=state)
        if self.return_hidden:
            return (out, h), new_states
        return out, new_states


CRNN_Layer = CRNN
CLSTM_Layer = CLSTM
CLiGRU_Layer = CLiGRU


# --- reference ``c_ops.py`` public helpers -------------------------------

def unitary_init(rng, in_features, out_features, criterion="glorot"):
    """Unit-modulus complex init (reference ``c_ops.py:unitary_init``):
    i.i.d. uniform (real, imag) pairs normalized to the unit circle."""
    k1, k2 = split_rngs(rng, 2)
    del criterion
    v_r = jax.random.uniform(k1, (in_features, out_features),
                             minval=-1.0, maxval=1.0)
    v_i = jax.random.uniform(k2, (in_features, out_features),
                             minval=-1.0, maxval=1.0)
    norm = jnp.sqrt(v_r ** 2 + v_i ** 2) + 1e-4
    return v_r / norm, v_i / norm


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
