"""Containers (analogue of reference ``speechbrain/nnet/containers.py``)."""
from __future__ import annotations

from svt_speechbrain_tpu.nnet.core import Module, split_rngs


class Sequential(Module):
    """Apply stateless modules in order (reference ``containers.py:18``).

    Parameters are stored per-layer under string indices so checkpoints are
    order-stable.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> from svt_speechbrain_tpu.nnet.linear import Linear
    >>> seq = Sequential(Linear(8, 4), Linear(2, 8))
    >>> params = seq.init(jax.random.PRNGKey(0))
    >>> sorted(params.keys())
    ['0', '1']
    >>> seq(params, jnp.ones((5, 4))).shape
    (5, 2)
    """

    def __init__(self, *layers):
        self.layers = list(layers)

    def init(self, rng):
        keys = split_rngs(rng, max(len(self.layers), 1))
        return {str(i): layer.init(k) for i, (layer, k) in enumerate(zip(self.layers, keys))}

    def __call__(self, params, x, **kwargs):
        for i, layer in enumerate(self.layers):
            x = layer(params[str(i)], x, **kwargs)
        return x


class LengthsCapableSequential(Sequential):
    """Sequential that forwards ``lengths`` to layers that accept it
    (reference ``containers.py:180``)."""

    def __call__(self, params, x, lengths=None, **kwargs):
        import inspect

        for i, layer in enumerate(self.layers):
            takes_lengths = False
            try:
                takes_lengths = "lengths" in inspect.signature(layer.__call__).parameters
            except (TypeError, ValueError):
                pass
            if takes_lengths and lengths is not None:
                x = layer(params[str(i)], x, lengths=lengths, **kwargs)
            else:
                x = layer(params[str(i)], x, **kwargs)
            if isinstance(x, tuple):
                x = x[0]
        return x


class ConnectBlocks(Module):
    """Stack blocks with residual/dense/skip connections between them
    (reference ``containers.py:300``)."""

    def __init__(self, *blocks, shortcut_type="residual", shortcut_projection=False):
        assert shortcut_type in ("residual", "dense", "skip")
        self.blocks = list(blocks)
        self.shortcut_type = shortcut_type

    def init(self, rng):
        keys = split_rngs(rng, max(len(self.blocks), 1))
        return {str(i): b.init(k) for i, (b, k) in enumerate(zip(self.blocks, keys))}

    def __call__(self, params, x, **kwargs):
        shortcut = x
        skips = []
        for i, block in enumerate(self.blocks):
            y = block(params[str(i)], x, **kwargs)
            if isinstance(y, tuple):
                y = y[0]
            if self.shortcut_type == "residual" and y.shape == shortcut.shape:
                y = y + shortcut
                shortcut = y
            elif self.shortcut_type == "dense" and y.shape == x.shape:
                y = y + x
            elif self.shortcut_type == "skip":
                skips.append(y)
            x = y
        if self.shortcut_type == "skip":
            out = skips[0]
            for s in skips[1:]:
                if s.shape == out.shape:
                    out = out + s
            return out
        return x


class ModuleList(Module):
    """A list of modules with jointly-initialized params; apply is caller-defined
    (analogue of ``torch.nn.ModuleList`` used by the AV-fusion recipes,
    ``N20EMv2/audio_visual/train_rca_av.py``)."""

    def __init__(self, *modules):
        self.modules = list(modules)

    def __len__(self):
        return len(self.modules)

    def __getitem__(self, i):
        return self.modules[i]

    def init(self, rng):
        keys = split_rngs(rng, max(len(self.modules), 1))
        return {str(i): m.init(k) for i, (m, k) in enumerate(zip(self.modules, keys))}
