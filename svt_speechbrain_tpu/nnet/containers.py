"""Containers (analogue of reference ``speechbrain/nnet/containers.py``)."""
from __future__ import annotations

from svt_speechbrain_tpu.nnet.core import Module, split_rngs


class Sequential(Module):
    """Apply stateless modules in order (reference ``containers.py:18``).

    Parameters are stored per-layer under string indices so checkpoints are
    order-stable.
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
