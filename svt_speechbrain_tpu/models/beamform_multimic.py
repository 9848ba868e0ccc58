"""Multi-mic beamforming lobe (analogue of reference
``speechbrain/lobes/beamform_multimic.py``): STFT → covariance → GCC-PHAT
TDOA → delay-and-sum → ISTFT, end-to-end as one jit-able chain."""
from __future__ import annotations


from svt_speechbrain_tpu.nnet.core import Module
from svt_speechbrain_tpu.processing.features import STFT, ISTFT
from svt_speechbrain_tpu.processing.multi_mic import Covariance, GccPhat, DelaySum


class DelaySum_Beamformer(Module):
    """Reference ``beamform_multimic.py:15``: multi-channel waveform
    (B, T, C) → beamformed mono waveform (B, T).

    Example
    -------
    >>> import numpy as np, jax.numpy as jnp
    >>> src = np.random.default_rng(0).normal(size=4000).astype(np.float32)
    >>> sig = np.stack([src, np.roll(src, 3)], axis=-1)[None]  # mic1 lags 3
    >>> bf = DelaySum_Beamformer(sampling_rate=16000, tdoa_max=8)
    >>> out = bf(None, jnp.asarray(sig))
    >>> out.shape
    (1, 4000)
    >>> corr = np.corrcoef(np.asarray(out)[0, 200:3800], src[200:3800])[0, 1]
    >>> bool(corr > 0.99)      # aligned average reconstructs the source
    True
    """

    def __init__(self, sampling_rate=16000, tdoa_max=None):
        self.stft = STFT(sample_rate=sampling_rate)
        self.cov = Covariance()
        self.gccphat = GccPhat(tdoa_max=tdoa_max)
        self.delaysum = DelaySum()
        self.istft = ISTFT(sample_rate=sampling_rate)

    def __call__(self, params, mics_signals):
        del params
        xs = self.stft(None, mics_signals)       # (B, T', F, 2, C)
        cov = self.cov(None, xs)                 # (B, T', F, 2, P) packed
        tdoas = self.gccphat(None, cov)          # (B, T', P) fractional
        ys = self.delaysum(None, xs, tdoas)      # (B, T', F, 2, 1)
        return self.istft(None, ys[..., 0], sig_length=mics_signals.shape[1])
