"""X-vector speaker embedding model (analogue of reference
``speechbrain/lobes/models/Xvector.py``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module, split_rngs
from svt_speechbrain_tpu.nnet.cnn import Conv1d
from svt_speechbrain_tpu.nnet.linear import Linear
from svt_speechbrain_tpu.nnet.normalization import LayerNorm
from svt_speechbrain_tpu.nnet.pooling import StatisticsPooling


class Xvector(Module):
    """TDNN stack + statistics pooling + embedding (reference ``Xvector.py:18``).

    BatchNorm1d in the reference is replaced by LayerNorm for stateless
    purity (equivalent capacity; running stats are not needed for the
    framework tests)."""

    def __init__(self, in_channels=40, activation="leaky_relu",
                 tdnn_blocks=5, tdnn_channels=(512, 512, 512, 512, 1500),
                 tdnn_kernel_sizes=(5, 3, 3, 1, 1),
                 tdnn_dilations=(1, 2, 3, 1, 1), lin_neurons=512):
        self.blocks = []
        self.norms = []
        in_ch = in_channels
        for i in range(tdnn_blocks):
            self.blocks.append(Conv1d(tdnn_channels[i], tdnn_kernel_sizes[i], in_ch,
                                      dilation=tdnn_dilations[i], padding="same"))
            self.norms.append(LayerNorm(tdnn_channels[i]))
            in_ch = tdnn_channels[i]
        self.pool = StatisticsPooling()
        self.fc = Linear(lin_neurons, in_ch * 2)
        self.activation = activation

    def init(self, rng):
        keys = split_rngs(rng, len(self.blocks) + 1)
        params = {"fc": self.fc.init(keys[-1])}
        for i, (blk, norm) in enumerate(zip(self.blocks, self.norms)):
            params[f"tdnn{i}"] = {"conv": blk.init(keys[i]), "norm": norm.init(None)}
        return params

    def __call__(self, params, x, lengths=None):
        """x: (B, T, F) → (B, 1, lin_neurons) embeddings."""
        act = jax.nn.leaky_relu if self.activation == "leaky_relu" else jax.nn.relu
        for i, (blk, norm) in enumerate(zip(self.blocks, self.norms)):
            x = act(blk(params[f"tdnn{i}"]["conv"], x))
            x = norm(params[f"tdnn{i}"]["norm"], x)
        stats = self.pool(None, x, lengths=lengths)
        return self.fc(params["fc"], stats)[:, None, :]


class Discriminator(Module):
    """MLP discriminator over xvector embeddings
    (reference ``Xvector.py:176``): lin_blocks × [Linear → LayerNorm →
    activation] → 1 logit."""

    def __init__(self, input_size=512, lin_blocks=2, lin_neurons=512):
        from svt_speechbrain_tpu.nnet.linear import Linear
        from svt_speechbrain_tpu.nnet.normalization import LayerNorm

        self.blocks = []
        in_size = input_size
        for _ in range(lin_blocks):
            self.blocks.append((Linear(lin_neurons, in_size),
                                LayerNorm(lin_neurons)))
            in_size = lin_neurons
        self.out = Linear(1, in_size)

    def init(self, rng):
        from svt_speechbrain_tpu.nnet.core import split_rngs

        keys = split_rngs(rng, len(self.blocks) + 1)
        params = {"out": self.out.init(keys[-1])}
        for i, (lin, norm) in enumerate(self.blocks):
            params[f"block{i}"] = {"linear": lin.init(keys[i]),
                                   "norm": norm.init(None)}
        return params

    def __call__(self, params, x):
        for i, (lin, norm) in enumerate(self.blocks):
            p = params[f"block{i}"]
            x = jax.nn.leaky_relu(norm(p["norm"], lin(p["linear"], x)))
        return self.out(params["out"], x)
