"""ContextNet and ESPnetVGG encoder lobes (analogue of reference
``speechbrain/lobes/models/ContextNet.py`` / ``ESPnetVGG.py``). ContextNet
uses the reference's BatchNorm1d (running stats in the state tree)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module, split_rngs
from svt_speechbrain_tpu.nnet.cnn import Conv1d, Conv2d, DepthwiseSeparableConv1d
from svt_speechbrain_tpu.nnet.linear import Linear
from svt_speechbrain_tpu.nnet.normalization import BatchNorm1d
from svt_speechbrain_tpu.nnet.pooling import Pooling2d
from svt_speechbrain_tpu.nnet.rnn import LSTM
from svt_speechbrain_tpu.nnet.activations import Swish


class SEmodule(Module):
    """Squeeze-and-excitation over time-averaged channels
    (reference ``ContextNet.py:211``)."""

    def __init__(self, inner_dim, input_size):
        self.lin1 = Linear(inner_dim, input_size)
        self.lin2 = Linear(input_size, inner_dim)

    def init(self, rng):
        k1, k2 = split_rngs(rng, 2)
        return {"lin1": self.lin1.init(k1), "lin2": self.lin2.init(k2)}

    def __call__(self, params, x):
        avg = jnp.mean(x, axis=1, keepdims=True)
        s = jax.nn.relu(self.lin1(params["lin1"], avg))
        s = jax.nn.sigmoid(self.lin2(params["lin2"], s))
        return x * s


class ContextNetBlock(Module):
    """Depthwise-separable convs + SE + residual (reference ``ContextNet.py:268``)."""

    def __init__(self, n_convs, channels, in_channels, kernel_size=3, stride=1,
                 residual=True, se_inner=64):
        self.convs = []
        ch = in_channels
        for i in range(n_convs):
            s = stride if i == n_convs - 1 else 1
            self.convs.append(DepthwiseSeparableConv1d(
                channels, kernel_size, ch, stride=s))
            ch = channels
        self.norms = [BatchNorm1d(channels) for _ in range(n_convs)]
        self.se = SEmodule(channels, channels)
        self.residual = residual
        self.stride = stride
        self.res_conv = (Conv1d(channels, 1, in_channels, stride=stride,
                                padding="same", padding_mode="reflect", bias=False)
                         if residual else None)
        self.swish = Swish()

    def init(self, rng):
        keys = split_rngs(rng, len(self.convs) + 2)
        params = {"se": self.se.init(keys[-1])}
        for i, conv in enumerate(self.convs):
            params[f"conv{i}"] = conv.init(keys[i])
            params[f"norm{i}"] = self.norms[i].init(None)
        if self.res_conv is not None:
            params["res"] = self.res_conv.init(keys[-2])
        return params

    def init_state(self):
        return {f"norm{i}": n.init_state() for i, n in enumerate(self.norms)}

    def __call__(self, params, x, state, train=False):
        residual = x
        new_state = {}
        for i, conv in enumerate(self.convs):
            x = conv(params[f"conv{i}"], x)
            x, new_state[f"norm{i}"] = self.norms[i](
                params[f"norm{i}"], state[f"norm{i}"], x, train=train)
            x = self.swish(None, x)
        x = self.se(params["se"], x)
        if self.res_conv is not None:
            res = self.res_conv(params["res"], residual)
            if res.shape == x.shape:
                x = x + res
        return x, new_state


class ContextNet(Module):
    """ContextNet encoder (reference ``ContextNet.py:18``), simplified to the
    block schedule (channel/stride plan of the small variant).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = ContextNet(input_size=40, out_channels=64,
    ...                  conv_channels=[32, 32, 32, 32, 64],
    ...                  num_blocks=5, num_layers=2)
    >>> params = net.init(jax.random.PRNGKey(0))
    >>> net(params, jnp.ones((2, 16, 40))).shape
    (2, 16, 64)
    """

    def __init__(self, input_size, out_channels=640, conv_channels=None,
                 kernel_size=3, strides=None, num_blocks=5, num_layers=2,
                 se_inner=64):
        conv_channels = conv_channels or [128] * (num_blocks - 1) + [out_channels]
        strides = strides or [1] * num_blocks
        self.blocks = []
        ch = input_size
        for i in range(num_blocks):
            self.blocks.append(ContextNetBlock(
                num_layers, conv_channels[i], ch, kernel_size, strides[i]))
            ch = conv_channels[i]

    def init(self, rng):
        keys = split_rngs(rng, len(self.blocks))
        return {str(i): b.init(k) for i, (b, k) in enumerate(zip(self.blocks, keys))}

    def init_state(self):
        return {str(i): b.init_state() for i, b in enumerate(self.blocks)}

    def __call__(self, params, x, state=None, train=False):
        """With ``state`` (BatchNorm running stats) returns ``(out,
        new_state)``; without, returns ``out`` (train mode uses batch
        statistics like torch)."""
        return_state = state is not None
        if state is None:
            state = self.init_state()
        new_state = {}
        for i, b in enumerate(self.blocks):
            x, new_state[str(i)] = b(params[str(i)], x, state[str(i)],
                                     train=train)
        if return_state:
            return x, new_state
        return x


class ESPnetVGG(Module):
    """VGG2L frontend + LSTM (reference ``ESPnetVGG.py:18``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> vgg = ESPnetVGG(input_size=40, vgg_channels=(4, 8),
    ...                 rnn_neurons=16, rnn_layers=1)
    >>> params = vgg.init(jax.random.PRNGKey(0))
    >>> vgg(params, jnp.ones((2, 8, 40))).shape   # 2x2 pooling per VGG block
    (2, 2, 32)
    """

    def __init__(self, input_size, vgg_channels=(64, 128), rnn_neurons=512,
                 rnn_layers=4, rnn_bidirectional=True, dropout=0.15):
        self.convs = []
        in_ch = 1
        for ch in vgg_channels:
            self.convs.append((Conv2d(ch, 3, in_ch, padding="same", padding_mode="reflect"),
                               Conv2d(ch, 3, ch, padding="same", padding_mode="reflect")))
            in_ch = ch
        self.pool = Pooling2d("max", (2, 2))
        feat = input_size
        for _ in vgg_channels:
            feat = feat // 2
        self.rnn = LSTM(rnn_neurons, input_size=feat * in_ch,
                        num_layers=rnn_layers, bidirectional=rnn_bidirectional,
                        dropout=dropout)

    def init(self, rng):
        keys = split_rngs(rng, 2 * len(self.convs) + 1)
        params = {"rnn": self.rnn.init(keys[-1])}
        for i, (c1, c2) in enumerate(self.convs):
            params[f"conv{i}a"] = c1.init(keys[2 * i])
            params[f"conv{i}b"] = c2.init(keys[2 * i + 1])
        return params

    def __call__(self, params, x, rng=None, train=False):
        h = x[..., None]  # (B, T, F, 1)
        for i in range(len(self.convs)):
            h = jax.nn.relu(self.convs[i][0](params[f"conv{i}a"], h))
            h = jax.nn.relu(self.convs[i][1](params[f"conv{i}b"], h))
            h = self.pool(None, h)
        b, t = h.shape[0], h.shape[1]
        h = h.reshape(b, t, -1)
        out, _ = self.rnn(params["rnn"], h, rng=rng, train=train)
        return out
