"""Embedding (analogue of reference ``speechbrain/nnet/embedding.py``)."""
from __future__ import annotations

import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module, normal_init


class Embedding(Module):
    """Token embedding lookup with optional blank-id zeroing
    (reference ``embedding.py:16``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> emb = Embedding(num_embeddings=10, embedding_dim=16)
    >>> params = emb.init(jax.random.PRNGKey(0))
    >>> emb(params, jnp.asarray([[1, 2, 3]])).shape
    (1, 3, 16)
    >>> onehot = Embedding(4, consider_as_one_hot=True, blank_id=0)
    >>> [int(v) for v in onehot(onehot.init(None), jnp.asarray([2]))[0]]
    [0, 1, 0]
    """

    def __init__(self, num_embeddings, embedding_dim=128, consider_as_one_hot=False, blank_id=0):
        self.num_embeddings = num_embeddings
        self.embedding_dim = embedding_dim
        self.consider_as_one_hot = consider_as_one_hot
        self.blank_id = blank_id

    def init(self, rng):
        if self.consider_as_one_hot:
            # fixed one-hot table with the blank row removed (dim = N-1)
            eye = jnp.eye(self.num_embeddings, dtype=jnp.float32)
            table = jnp.delete(eye, self.blank_id, axis=1)
            return {"table": table}
        return {"table": normal_init(rng, (self.num_embeddings, self.embedding_dim), stddev=1.0)}

    def __call__(self, params, x):
        return jnp.take(params["table"], x.astype(jnp.int32), axis=0)
