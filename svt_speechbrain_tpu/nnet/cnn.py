"""Convolutions (analogue of reference ``speechbrain/nnet/CNN.py``).

Channel-last throughout: Conv1d takes (batch, time, channels), Conv2d
(batch, H, W, C), Conv3d (batch, T, H, W, C) — the layouts XLA tiles best on
TPU. The reference's "same"-padding convs (``CNN.py:299,478``) are reproduced
with explicit symmetric padding so output time equals input time for odd and
even kernels alike.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from svt_speechbrain_tpu.nnet.core import Module, kaiming_uniform, uniform_bias, split_rngs


def _ntuple(x, n):
    if isinstance(x, (tuple, list)):
        assert len(x) == n
        return tuple(x)
    return (x,) * n


def conv_output_length(length, kernel, stride, padding="valid", dilation=1):
    """Output length of a conv along one axis (python ints; used for frame-rate
    arithmetic, e.g. the wav2vec2 49.8 Hz frontend)."""
    eff_k = dilation * (kernel - 1) + 1
    if padding == "same":
        # mirror the reference's get_padding_elem (CNN.py:1105): strided
        # convs pad floor(k/2) per side (dilation ignored), stride-1 convs
        # pad floor(d*(k-1)/2) per side — so even kernels SHRINK by one.
        pad = kernel // 2 if stride > 1 else (dilation * (kernel - 1)) // 2
        length = length + 2 * pad
        return (length - eff_k) // stride + 1
    if padding == "causal":
        length = length + eff_k - 1
    return (length - eff_k) // stride + 1


class _ConvNd(Module):
    """Shared N-dimensional conv: weight layout (*kernel, in/groups, out)."""

    NDIM = 1

    def __init__(
        self,
        out_channels,
        kernel_size,
        in_channels,
        stride=1,
        dilation=1,
        padding="same",
        groups=1,
        bias=True,
        padding_mode="zeros",
    ):
        n = self.NDIM
        self.out_channels = out_channels
        self.in_channels = in_channels
        self.kernel_size = _ntuple(kernel_size, n)
        self.stride = _ntuple(stride, n)
        self.dilation = _ntuple(dilation, n)
        self.padding = padding
        self.groups = groups
        self.use_bias = bias
        # "zeros" mirrors torch nn.Conv* (HF-converted models); "reflect"
        # mirrors the reference speechbrain Conv* default (CNN.py:80) —
        # speechbrain-lobe models pass padding_mode="reflect" explicitly
        self.padding_mode = padding_mode
        if in_channels % groups or out_channels % groups:
            raise ValueError("in/out channels must be divisible by groups")

    def init(self, rng):
        wkey, bkey = split_rngs(rng, 2)
        fan_in = (self.in_channels // self.groups) * int(np.prod(self.kernel_size))
        w = kaiming_uniform(
            wkey,
            (*self.kernel_size, self.in_channels // self.groups, self.out_channels),
            fan_in=fan_in,
        )
        params = {"w": w}
        if self.use_bias:
            params["b"] = uniform_bias(bkey, (self.out_channels,), fan_in=fan_in)
        return params

    def _pad_config(self):
        n = self.NDIM
        if self.padding == "valid":
            return [(0, 0)] * n
        pads = []
        for i in range(n):
            eff_k = self.dilation[i] * (self.kernel_size[i] - 1) + 1
            if self.padding == "same":
                # reference-exact (CNN.py get_padding_elem:1105): strided
                # convs pad floor(k/2) per side IGNORING dilation; stride-1
                # convs pad floor(d*(k-1)/2) symmetric — for even kernels
                # the output is one frame SHORTER than the input, exactly
                # like the reference.
                if self.stride[i] > 1:
                    pad = self.kernel_size[i] // 2
                else:
                    pad = (eff_k - 1) // 2
                pads.append((pad, pad))
            elif self.padding == "causal":
                pads.append((eff_k - 1, 0))
            else:
                raise ValueError(f"unknown padding {self.padding!r}")
        return pads

    def __call__(self, params, x):
        n = self.NDIM
        spatial = "DHW"[-n:] if n > 1 else "W"
        lhs_spec = "N" + spatial + "C"
        rhs_spec = spatial + "IO"
        conv_padding = self._pad_config()
        if self.padding_mode != "zeros" and any(
                p != (0, 0) for p in conv_padding):
            mode = {"reflect": "reflect", "replicate": "edge",
                    "circular": "wrap"}[self.padding_mode]
            x = jnp.pad(x, [(0, 0)] + list(conv_padding) + [(0, 0)],
                        mode=mode)
            conv_padding = [(0, 0)] * n
        dn = jax.lax.conv_dimension_numbers(x.shape, params["w"].shape, (lhs_spec, rhs_spec, lhs_spec))
        # no preferred_element_type: the TPU MXU accumulates bf16 convs in
        # f32 regardless, and forcing an f32 output breaks the transpose
        # (backward) rule under mixed precision (cotangent f32 vs operand
        # bf16)
        y = jax.lax.conv_general_dilated(
            x,
            params["w"].astype(x.dtype),
            window_strides=self.stride,
            padding=conv_padding,
            rhs_dilation=self.dilation,
            dimension_numbers=dn,
            feature_group_count=self.groups,
        )
        if self.use_bias:
            y = y + params["b"].astype(x.dtype)
        return y


class Conv1d(_ConvNd):
    """1-D conv over (batch, time, channels) (reference ``CNN.py:299``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> conv = Conv1d(out_channels=8, kernel_size=3, in_channels=4)
    >>> params = conv.init(jax.random.PRNGKey(0))
    >>> conv(params, jnp.ones((2, 16, 4))).shape     # "same" padding
    (2, 16, 8)
    >>> strided = Conv1d(8, 3, 4, stride=2, padding="valid")
    >>> strided(strided.init(jax.random.PRNGKey(0)),
    ...         jnp.ones((2, 16, 4))).shape
    (2, 7, 8)
    """

    NDIM = 1


class Conv2d(_ConvNd):
    """2-D conv over (batch, H, W, C) (reference ``CNN.py:478``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> conv = Conv2d(out_channels=6, kernel_size=(3, 3), in_channels=2)
    >>> params = conv.init(jax.random.PRNGKey(1))
    >>> conv(params, jnp.ones((1, 10, 12, 2))).shape
    (1, 10, 12, 6)
    """

    NDIM = 2


class Conv3d(_ConvNd):
    """3-D conv over (batch, T, H, W, C) — the lip-ROI frontend3D conv
    (reference ``N20EMv2/video_only/resnet.py:139``)."""

    NDIM = 3


class ConvTranspose1d(Module):
    """Transposed 1-D conv over (batch, time, channels)
    (reference ``CNN.py:727``)."""

    def __init__(self, out_channels, kernel_size, in_channels, stride=1, padding=0, output_padding=0, bias=True):
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.in_channels = in_channels
        self.stride = stride
        self.padding = padding
        self.output_padding = output_padding
        self.use_bias = bias

    def init(self, rng):
        wkey, bkey = split_rngs(rng, 2)
        fan_in = self.in_channels * self.kernel_size
        params = {
            "w": kaiming_uniform(wkey, (self.kernel_size, self.out_channels, self.in_channels), fan_in=fan_in)
        }
        if self.use_bias:
            params["b"] = uniform_bias(bkey, (self.out_channels,), fan_in=fan_in)
        return params

    def __call__(self, params, x):
        # torch ConvTranspose1d semantics via lhs dilation
        pad = self.kernel_size - 1 - self.padding
        dn = jax.lax.conv_dimension_numbers(x.shape, (self.kernel_size, self.out_channels, self.in_channels), ("NWC", "WOI", "NWC"))
        y = jax.lax.conv_general_dilated(
            x,
            jnp.flip(params["w"], 0).astype(x.dtype),
            window_strides=(1,),
            padding=[(pad, pad + self.output_padding)],
            lhs_dilation=(self.stride,),
            dimension_numbers=dn,
        )
        if self.use_bias:
            y = y + params["b"].astype(x.dtype)
        return y


class DepthwiseSeparableConv1d(Module):
    """Depthwise + pointwise conv (reference ``CNN.py:930``)."""

    def __init__(self, out_channels, kernel_size, in_channels, stride=1, dilation=1, padding="same", bias=True):
        self.depthwise = Conv1d(
            in_channels, kernel_size, in_channels, stride=stride, dilation=dilation,
            padding=padding, groups=in_channels, bias=bias,
        )
        self.pointwise = Conv1d(out_channels, 1, in_channels, padding="valid", bias=bias)

    def init(self, rng):
        k1, k2 = split_rngs(rng, 2)
        return {"depthwise": self.depthwise.init(k1), "pointwise": self.pointwise.init(k2)}

    def __call__(self, params, x):
        return self.pointwise(params["pointwise"], self.depthwise(params["depthwise"], x))


class SincConv(Module):
    """Sinc-based parameterized band-pass filterbank conv (SincNet;
    reference ``CNN.py:21``). Learns per-filter low/high cutoffs; the kernel is
    synthesized on the fly — on TPU this is a cheap elementwise build followed
    by one MXU conv."""

    def __init__(self, out_channels, kernel_size, in_channels=1, stride=1, dilation=1,
                 padding="same", sample_rate=16000, min_low_hz=50, min_band_hz=50):
        if kernel_size % 2 == 0:
            kernel_size = kernel_size + 1  # force odd (reference does the same)
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.in_channels = in_channels
        self.stride = stride
        self.dilation = dilation
        self.padding = padding
        self.sample_rate = sample_rate
        self.min_low_hz = min_low_hz
        self.min_band_hz = min_band_hz

    def init(self, rng):
        del rng
        # mel-spaced initialization, as in the reference
        low_hz = 30.0
        high_hz = self.sample_rate / 2 - (self.min_low_hz + self.min_band_hz)

        def to_mel(hz):
            return 2595 * np.log10(1 + hz / 700)

        def to_hz(mel):
            return 700 * (10 ** (mel / 2595) - 1)

        mel = np.linspace(to_mel(low_hz), to_mel(high_hz), self.out_channels + 1)
        hz = to_hz(mel)
        return {
            "low_hz": jnp.asarray(hz[:-1, None], jnp.float32),
            "band_hz": jnp.asarray(np.diff(hz)[:, None], jnp.float32),
        }

    def _filters(self, params):
        low = self.min_low_hz + jnp.abs(params["low_hz"])
        high = jnp.clip(low + self.min_band_hz + jnp.abs(params["band_hz"]), self.min_low_hz, self.sample_rate / 2)
        band = (high - low)[:, 0]

        n_ = (self.kernel_size - 1) / 2.0
        n = jnp.arange(-n_, 0.0)[None, :] * 2 * jnp.pi / self.sample_rate
        window = 0.54 - 0.46 * jnp.cos(2 * jnp.pi * jnp.arange(0, n_) / self.kernel_size)

        f_low = jnp.matmul(low, n[0:1])
        f_high = jnp.matmul(high, n[0:1])
        bp_left = ((jnp.sin(f_high) - jnp.sin(f_low)) / (n / 2)) * window
        bp_center = 2 * band[:, None]
        filters = jnp.concatenate([bp_left, bp_center, jnp.flip(bp_left, -1)], axis=1)
        filters = filters / (2 * band[:, None])
        return filters  # (out_channels, kernel)

    def __call__(self, params, x):
        filters = self._filters(params)  # (O, K)
        w = filters.T[:, None, :]  # (K, 1, O)
        conv = Conv1d(self.out_channels, self.kernel_size, self.in_channels,
                      stride=self.stride, dilation=self.dilation, padding=self.padding, bias=False)
        return conv({"w": w}, x)


def get_padding_elem(L_in, stride, kernel_size, dilation):
    """Per-side same-padding amounts (reference ``CNN.py:1002``)."""
    if stride > 1:
        padding = [math.floor(kernel_size / 2), math.floor(kernel_size / 2)]
    else:
        L_out = math.floor((L_in - dilation * (kernel_size - 1) - 1) / stride) + 1
        padding = [math.floor((L_in - L_out) / 2),
                   math.floor((L_in - L_out) / 2)]
    return padding


def get_padding_elem_transposed(L_out, L_in, stride, kernel_size, dilation,
                                output_padding):
    """Padding for ConvTranspose to reach an exact output length
    (reference ``CNN.py:1027``)."""
    padding = -0.5 * (L_out - (L_in - 1) * stride - dilation
                      * (kernel_size - 1) - output_padding - 1)
    return int(padding)


class Conv2dWithConstraint(Conv2d):
    """Conv2d with a per-filter kernel max-norm constraint applied at call
    time (reference ``CNN.py:661``; torch renorms in-place on forward —
    functionally, the renormalized weight is used for the computation)."""

    def __init__(self, *args, max_norm=1.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.max_norm = max_norm

    def __call__(self, params, x):
        w = params["w"]
        norm = jnp.sqrt(jnp.sum(jnp.square(w), axis=tuple(range(w.ndim - 1)),
                                keepdims=True))
        scale = jnp.minimum(1.0, self.max_norm / jnp.maximum(norm, 1e-12))
        params = dict(params, w=w * scale)
        return super().__call__(params, x)


class DepthwiseSeparableConv2d(Module):
    """Depthwise (per-channel) + pointwise 1x1 2-D convolution
    (reference ``CNN.py:930``)."""

    def __init__(self, out_channels, kernel_size, in_channels, stride=1,
                 dilation=1, padding="same", bias=True):
        self.depthwise = Conv2d(in_channels, kernel_size, in_channels,
                                stride=stride, dilation=dilation,
                                padding=padding, groups=in_channels, bias=bias)
        self.pointwise = Conv2d(out_channels, 1, in_channels, bias=bias)

    def init(self, rng):
        k1, k2 = split_rngs(rng, 2)
        return {"depthwise": self.depthwise.init(k1),
                "pointwise": self.pointwise.init(k2)}

    def __call__(self, params, x):
        return self.pointwise(params["pointwise"],
                              self.depthwise(params["depthwise"], x))
