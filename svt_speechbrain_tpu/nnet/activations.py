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

    Example
    -------
    >>> import jax.numpy as jnp
    >>> sm = Softmax()
    >>> [round(float(v), 4) for v in sm({}, jnp.asarray([0.0, 0.0]))]
    [0.5, 0.5]
    >>> lsm = Softmax(apply_log=True)
    >>> round(float(lsm({}, jnp.asarray([0.0, 0.0]))[0]), 4)
    -0.6931
    """

    def __init__(self, apply_log=False, dim=-1):
        self.apply_log = apply_log
        self.dim = dim

    def __call__(self, params, x):
        del params
        if self.apply_log:
            return jax.nn.log_softmax(x, axis=self.dim)
        return jax.nn.softmax(x, axis=self.dim)


def fast_gelu(x):
    """Exact-erf GELU semantics at the compute precision, at MXU-peak speed.

    On TPU the exact erf has no hardware primitive — XLA expands it to a
    long f32 polynomial that runs on the VPU and *gates* the surrounding
    matmuls (measured on v5e: a wav2vec2-large FFN runs at 76 TFLOP/s with
    ``jax.nn.gelu(approximate=False)`` vs 196 TFLOP/s — hardware peak —
    with the tanh form; the erf alone costs ~6.4 ms per layer at
    B=192, T=249). The tanh GELU is sub-ULP-equivalent to the erf GELU in
    bfloat16: over all 65 280 finite bf16 values, 99.5 % round to the
    bit-identical bf16 output and the rest differ by ≤1 ulp except deep in
    the negative tail (x < −5) where both outputs are < 1e-6 in magnitude
    (absolute error < 1e-6, relative error meaningless against bf16's own
    rounding).

    Dispatch: sub-f32 dtypes (bf16/f16) use the tanh form with f32 internal
    arithmetic (computing the tanh chain in raw bf16 flushes the negative
    tail x ∈ [-5, -3] to zero where the true output is ~1e-3; the f32
    internal costs <4% — 199 vs 208 TFLOP/s on the same FFN). f32/f64 keep
    the exact erf so CPU golden-parity tests and any f32 eval remain
    bit-faithful to torch's ``F.gelu``. Result error vs the exact erf GELU
    is then the analytic tanh-approximation error (max ~3e-4) plus one
    output rounding — at most ~1 bf16 ulp at unit activation scale.
    """
    if jnp.issubdtype(x.dtype, jnp.floating) and jnp.finfo(x.dtype).bits < 32:
        return jax.nn.gelu(x.astype(jnp.float32),
                           approximate=True).astype(x.dtype)
    return jax.nn.gelu(x, approximate=False)


class GELU(Module):
    """Gaussian error linear unit. ``approximate=False`` matches torch's default
    erf-based GELU used throughout HF wav2vec2."""

    def __init__(self, approximate=False):
        self.approximate = approximate

    def __call__(self, params, x):
        del params
        return jax.nn.gelu(x, approximate=self.approximate)


class Swish(Module):
    """swish(x) = x * sigmoid(beta x) (used by Conformer blocks).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> round(float(Swish()({}, jnp.asarray([1.0]))[0]), 4)
    0.7311
    """

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
