"""X-vector speaker embedding model (analogue of reference
``speechbrain/lobes/models/Xvector.py``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module, split_rngs
from svt_speechbrain_tpu.nnet.cnn import Conv1d
from svt_speechbrain_tpu.nnet.linear import Linear
from svt_speechbrain_tpu.nnet.normalization import BatchNorm1d
from svt_speechbrain_tpu.nnet.pooling import StatisticsPooling


class Xvector(Module):
    """TDNN stack + statistics pooling + embedding (reference ``Xvector.py:18``):
    each block is Conv1d → activation → BatchNorm1d, exactly like the
    reference (running statistics live in the state tree).

    Stateful API: ``init_state()`` → per-block running stats;
    ``__call__(params, x, lengths=None, state=state, train=...)`` returns
    ``(emb, new_state)``. Without ``state`` the call returns just ``emb``
    (train mode uses batch statistics like torch; eval then normalizes
    with the untrained (0, 1) stats).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> model = Xvector(in_channels=24, lin_neurons=64,
    ...                 tdnn_channels=(32, 32, 32, 32, 96))
    >>> params = model.init(jax.random.PRNGKey(0))
    >>> model(params, jnp.ones((2, 50, 24))).shape
    (2, 1, 64)
    """

    def __init__(self, in_channels=40, activation="leaky_relu",
                 tdnn_blocks=5, tdnn_channels=(512, 512, 512, 512, 1500),
                 tdnn_kernel_sizes=(5, 3, 3, 1, 1),
                 tdnn_dilations=(1, 2, 3, 1, 1), lin_neurons=512):
        self.blocks = []
        self.norms = []
        in_ch = in_channels
        for i in range(tdnn_blocks):
            self.blocks.append(Conv1d(tdnn_channels[i], tdnn_kernel_sizes[i], in_ch,
                                      dilation=tdnn_dilations[i], padding="same",
                                      padding_mode="reflect"))
            self.norms.append(BatchNorm1d(tdnn_channels[i]))
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

    def init_state(self):
        return {f"tdnn{i}": norm.init_state()
                for i, norm in enumerate(self.norms)}

    def __call__(self, params, x, lengths=None, state=None, train=False):
        """x: (B, T, F) → (B, 1, lin_neurons) embeddings."""
        act = jax.nn.leaky_relu if self.activation == "leaky_relu" else jax.nn.relu
        return_state = state is not None
        if state is None:
            state = self.init_state()
        new_state = {}
        for i, (blk, norm) in enumerate(zip(self.blocks, self.norms)):
            x = act(blk(params[f"tdnn{i}"]["conv"], x))
            x, new_state[f"tdnn{i}"] = norm(
                params[f"tdnn{i}"]["norm"], state[f"tdnn{i}"], x, train=train)
        stats = self.pool(None, x, lengths=lengths)
        emb = self.fc(params["fc"], stats)[:, None, :]
        if return_state:
            return emb, new_state
        return emb


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
