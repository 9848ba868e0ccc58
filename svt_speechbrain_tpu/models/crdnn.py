"""CRDNN and VanillaNN model lobes (analogue of reference
``speechbrain/lobes/models/CRDNN.py`` / ``VanillaNN.py``)."""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module, split_rngs
from svt_speechbrain_tpu.nnet.cnn import Conv2d
from svt_speechbrain_tpu.nnet.linear import Linear
from svt_speechbrain_tpu.nnet.normalization import BatchNorm1d, LayerNorm
from svt_speechbrain_tpu.nnet.pooling import Pooling2d
from svt_speechbrain_tpu.nnet.rnn import LSTM, GRU, LiGRU
from svt_speechbrain_tpu.nnet.dropout import dropout as _dropout


class CNNBlock(Module):
    """Two same-padded Conv2d + LayerNorm + LeakyReLU + freq pooling
    (reference ``CRDNN.py:180``). Input (B, T, F) treated as (B, T, F, C)."""

    def __init__(self, channels, in_channels, kernel_size=(3, 3), pooling_size=(2, 2),
                 dropout=0.15):
        self.conv1 = Conv2d(channels, kernel_size, in_channels, padding="same", padding_mode="reflect")
        self.conv2 = Conv2d(channels, kernel_size, channels, padding="same", padding_mode="reflect")
        self.norm1 = LayerNorm(channels)
        self.norm2 = LayerNorm(channels)
        self.pool = Pooling2d("max", (1, pooling_size[-1]))
        self.dropout = dropout

    def init(self, rng):
        k1, k2 = split_rngs(rng, 2)
        return {"conv1": self.conv1.init(k1), "norm1": self.norm1.init(None),
                "conv2": self.conv2.init(k2), "norm2": self.norm2.init(None)}

    def __call__(self, params, x, rng=None, train=False):
        x = self.conv1(params["conv1"], x)
        x = self.norm1(params["norm1"], x)
        x = jax.nn.leaky_relu(x)
        x = self.conv2(params["conv2"], x)
        x = self.norm2(params["norm2"], x)
        x = jax.nn.leaky_relu(x)
        x = self.pool(None, x)
        if rng is not None:
            x = _dropout(x, self.dropout, rng, train)
        return x


class DNNBlock(Module):
    """Linear + BatchNorm1d + LeakyReLU (reference ``CRDNN.py:283``; running
    stats in the state tree)."""

    def __init__(self, neurons, input_size, dropout=0.15):
        self.linear = Linear(neurons, input_size)
        self.norm = BatchNorm1d(neurons)
        self.dropout = dropout

    def init(self, rng):
        return {"linear": self.linear.init(rng), "norm": self.norm.init(None)}

    def init_state(self):
        return self.norm.init_state()

    def __call__(self, params, x, state, rng=None, train=False):
        x = self.linear(params["linear"], x)
        x, new_state = self.norm(params["norm"], state, x, train=train)
        x = jax.nn.leaky_relu(x)
        if rng is not None:
            x = _dropout(x, self.dropout, rng, train)
        return x, new_state


class CRDNN(Module):
    """CNN blocks → (Li)GRU/LSTM → DNN blocks (reference ``CRDNN.py:27``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> model = CRDNN(input_size=40, cnn_channels=(16, 32), rnn_layers=1,
    ...               rnn_neurons=32, dnn_neurons=24)
    >>> params = model.init(jax.random.PRNGKey(0))
    >>> model(params, jnp.ones((2, 20, 40))).shape
    (2, 20, 24)
    """

    def __init__(self, input_size, cnn_blocks=2, cnn_channels=(128, 256),
                 cnn_kernelsize=(3, 3), time_pooling=False, time_pooling_size=2,
                 freq_pooling_size=2, rnn_class="lstm", rnn_layers=4,
                 rnn_neurons=512, rnn_bidirectional=True, dnn_blocks=2,
                 dnn_neurons=512, dropout=0.15):
        self.input_size = input_size
        self.cnn_blocks_n = cnn_blocks
        self.time_pooling = time_pooling
        self.time_pooling_size = time_pooling_size
        self.cnn = []
        in_ch = 1
        feat = input_size
        for i in range(cnn_blocks):
            self.cnn.append(CNNBlock(cnn_channels[i], in_ch, cnn_kernelsize,
                                     (1, freq_pooling_size), dropout))
            in_ch = cnn_channels[i]
            feat = feat // freq_pooling_size
        rnn_cls = {"lstm": LSTM, "gru": GRU, "ligru": LiGRU}[rnn_class]
        self.rnn = rnn_cls(rnn_neurons, input_size=feat * in_ch,
                           num_layers=rnn_layers, bidirectional=rnn_bidirectional,
                           dropout=dropout)
        rnn_out = rnn_neurons * (2 if rnn_bidirectional else 1)
        self.dnn = []
        in_size = rnn_out
        for _ in range(dnn_blocks):
            self.dnn.append(DNNBlock(dnn_neurons, in_size, dropout))
            in_size = dnn_neurons

    def init(self, rng):
        keys = split_rngs(rng, len(self.cnn) + 1 + len(self.dnn))
        params = {"rnn": self.rnn.init(keys[len(self.cnn)])}
        for i, blk in enumerate(self.cnn):
            params[f"cnn{i}"] = blk.init(keys[i])
        for i, blk in enumerate(self.dnn):
            params[f"dnn{i}"] = blk.init(keys[len(self.cnn) + 1 + i])
        return params

    def init_state(self):
        state = {f"dnn{i}": blk.init_state()
                 for i, blk in enumerate(self.dnn)}
        if hasattr(self.rnn, "init_state"):
            state["rnn"] = self.rnn.init_state()
        return state

    def __call__(self, params, x, rng=None, train=False, state=None):
        """x: (B, T, F) → (B, T', dnn_neurons). With ``state`` (BatchNorm /
        LiGRU running stats) returns ``(out, new_state)``; without, train
        mode uses batch statistics like torch."""
        return_state = state is not None
        if state is None:
            state = self.init_state()
        new_state = {}
        rngs = split_rngs(rng, len(self.cnn) + 1 + len(self.dnn)) if rng is not None \
            else [None] * (len(self.cnn) + 1 + len(self.dnn))
        h = x[..., None]  # (B, T, F, 1)
        for i, blk in enumerate(self.cnn):
            h = blk(params[f"cnn{i}"], h, rng=rngs[i], train=train)
        if self.time_pooling:
            h = Pooling2d("max", (self.time_pooling_size, 1))(None, h)
        b, t = h.shape[0], h.shape[1]
        h = h.reshape(b, t, -1)
        if "rnn" in state:
            h, _, new_state["rnn"] = self.rnn(
                params["rnn"], h, state=state["rnn"],
                rng=rngs[len(self.cnn)], train=train)
        else:
            h, _ = self.rnn(params["rnn"], h, rng=rngs[len(self.cnn)],
                            train=train)
        for i, blk in enumerate(self.dnn):
            h, new_state[f"dnn{i}"] = blk(
                params[f"dnn{i}"], h, state[f"dnn{i}"],
                rng=rngs[len(self.cnn) + 1 + i], train=train)
        if return_state:
            return h, new_state
        return h


class VanillaNN(Module):
    """Plain DNN over features (reference ``VanillaNN.py:15``)."""

    def __init__(self, input_size, dnn_blocks=2, dnn_neurons=512, activation="leaky_relu"):
        self.blocks = []
        in_size = input_size
        for _ in range(dnn_blocks):
            self.blocks.append(Linear(dnn_neurons, in_size))
            in_size = dnn_neurons
        self.activation = activation

    def init(self, rng):
        keys = split_rngs(rng, len(self.blocks))
        return {str(i): b.init(k) for i, (b, k) in enumerate(zip(self.blocks, keys))}

    def __call__(self, params, x):
        act = jax.nn.leaky_relu if self.activation == "leaky_relu" else jax.nn.relu
        for i, blk in enumerate(self.blocks):
            x = act(blk(params[str(i)], x))
        return x


# Reference public names (``lobes/models/CRDNN.py``)
CNN_Block = CNNBlock
DNN_Block = DNNBlock
