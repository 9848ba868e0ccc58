"""Activation modules (analogue of reference ``speechbrain/nnet/activations.py``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module


class Softmax(Module):
    """(Log-)softmax over a chosen axis (reference ``activations.py:15``).

    The AMT recipes use ``Softmax(apply_log=True)`` to turn head logits into
    log-probabilities for the NLL octave/pitch losses
    (``MIR_ST500/hparams/train_audio_ssl.yaml:121-122``).
    """

    def __init__(self, apply_log=False, dim=-1):
        self.apply_log = apply_log
        self.dim = dim

    def __call__(self, params, x):
        del params
        if self.apply_log:
            return jax.nn.log_softmax(x, axis=self.dim)
        return jax.nn.softmax(x, axis=self.dim)


class GELU(Module):
    """Gaussian error linear unit. ``approximate=False`` matches torch's default
    erf-based GELU used throughout HF wav2vec2."""

    def __init__(self, approximate=False):
        self.approximate = approximate

    def __call__(self, params, x):
        del params
        return jax.nn.gelu(x, approximate=self.approximate)


class Swish(Module):
    """swish(x) = x * sigmoid(beta x) (used by Conformer blocks)."""

    def __init__(self, beta=1.0):
        self.beta = beta

    def __call__(self, params, x):
        del params
        return x * jax.nn.sigmoid(self.beta * x)


class PReLU(Module):
    """Parametric ReLU with a single learned slope (torch ``nn.PReLU()`` default),
    used by the visual frontend (reference ``N20EMv2/video_only/resnet.py``)."""

    def __init__(self, num_parameters=1, init=0.25):
        self.num_parameters = num_parameters
        self.init_val = init

    def init(self, rng):
        del rng
        return {"alpha": jnp.full((self.num_parameters,), self.init_val, jnp.float32)}

    def __call__(self, params, x):
        alpha = params["alpha"]
        if self.num_parameters == 1:
            alpha = alpha[0]
        return jnp.where(x >= 0, x, alpha * x)


class GumbelSoftmax(Module):
    """Gumbel-Softmax sampling with optional straight-through discretization
    (reference ``activations.py:71``). Functional rng: pass ``rng`` per call."""

    def __init__(self, tau, hard=False, apply_log=False):
        self.tau = tau
        self.hard = hard
        self.apply_log = apply_log

    def __call__(self, params, x, rng=None):
        del params
        if rng is None:
            rng = jax.random.PRNGKey(0)
        g = -jnp.log(-jnp.log(
            jax.random.uniform(rng, x.shape, minval=1e-20, maxval=1.0) + 1e-20))
        y = jax.nn.softmax((x + g) / self.tau, axis=-1)
        if self.hard:  # straight-through: one-hot forward, soft backward
            one_hot = jax.nn.one_hot(jnp.argmax(y, axis=-1), x.shape[-1],
                                     dtype=y.dtype)
            y = one_hot + y - jax.lax.stop_gradient(y)
        if self.apply_log:
            return jnp.log(jnp.maximum(y, 1e-20))
        return y
