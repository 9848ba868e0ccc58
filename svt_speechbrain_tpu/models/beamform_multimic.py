"""Multi-mic beamforming lobe (analogue of reference
``speechbrain/lobes/beamform_multimic.py``): STFT → covariance → GCC-PHAT
TDOA → delay-and-sum → ISTFT, end-to-end as one jit-able chain."""
from __future__ import annotations


from svt_speechbrain_tpu.nnet.core import Module
from svt_speechbrain_tpu.processing.features import STFT, ISTFT
from svt_speechbrain_tpu.processing.multi_mic import Covariance, GccPhat, DelaySum


class DelaySum_Beamformer(Module):
    """Reference ``beamform_multimic.py:15``: multi-channel waveform
    (B, T, C) → beamformed mono waveform (B, T)."""

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
