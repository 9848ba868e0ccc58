"""RNN language model (analogue of reference
``speechbrain/lobes/models/RNNLM.py``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module, split_rngs
from svt_speechbrain_tpu.nnet.embedding import Embedding
from svt_speechbrain_tpu.nnet.linear import Linear
from svt_speechbrain_tpu.nnet.normalization import LayerNorm
from svt_speechbrain_tpu.nnet.rnn import LSTM, GRU


class RNNLM(Module):
    """Embedding → RNN → DNN → logits (reference ``RNNLM.py:19``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> lm = RNNLM(output_neurons=50, embedding_dim=16, rnn_layers=1,
    ...            rnn_neurons=32, dnn_neurons=24)
    >>> params = lm.init(jax.random.PRNGKey(0))
    >>> lm(params, jnp.asarray([[1, 2, 3]])).shape
    (1, 3, 50)
    """

    def __init__(self, output_neurons, embedding_dim=128, activation="leaky_relu",
                 dropout=0.15, rnn_class="lstm", rnn_layers=2, rnn_neurons=1024,
                 dnn_blocks=1, dnn_neurons=512, return_hidden=False):
        self.embedding = Embedding(output_neurons, embedding_dim)
        rnn_cls = {"lstm": LSTM, "gru": GRU}[rnn_class]
        self.rnn = rnn_cls(rnn_neurons, input_size=embedding_dim,
                           num_layers=rnn_layers, dropout=dropout)
        self.dnn = []
        in_size = rnn_neurons
        for _ in range(dnn_blocks):
            self.dnn.append((Linear(dnn_neurons, in_size), LayerNorm(dnn_neurons)))
            in_size = dnn_neurons
        self.out = Linear(output_neurons, in_size)
        self.return_hidden = return_hidden

    def init(self, rng):
        keys = split_rngs(rng, 3 + len(self.dnn))
        params = {"embedding": self.embedding.init(keys[0]),
                  "rnn": self.rnn.init(keys[1]),
                  "out": self.out.init(keys[2])}
        for i, (lin, norm) in enumerate(self.dnn):
            params[f"dnn{i}"] = {"linear": lin.init(keys[3 + i]),
                                 "norm": norm.init(None)}
        return params

    def __call__(self, params, x, hx=None, rng=None, train=False):
        """x: (B, U) token ids → (B, U, vocab) logits."""
        h = self.embedding(params["embedding"], x)
        h, hidden = self.rnn(params["rnn"], h, rng=rng, train=train)
        for i, (lin, norm) in enumerate(self.dnn):
            h = lin(params[f"dnn{i}"]["linear"], h)
            h = norm(params[f"dnn{i}"]["norm"], h)
            h = jax.nn.leaky_relu(h)
        logits = self.out(params["out"], h)
        if self.return_hidden:
            return logits, hidden
        return logits
