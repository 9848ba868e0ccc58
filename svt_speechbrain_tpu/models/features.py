"""Feature lobes: Fbank and MFCC pipelines (analogue of reference
``speechbrain/lobes/features.py``)."""
from __future__ import annotations

import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module
from svt_speechbrain_tpu.processing.features import (
    STFT, spectral_magnitude, Filterbank, DCT, Deltas, ContextWindow,
)


class Fbank(Module):
    """Waveform → log-mel filterbanks (reference ``features.py:18``).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> fbank = Fbank(n_mels=40)
    >>> feats = fbank(None, jnp.zeros((2, 16000)))   # 1 s of audio
    >>> feats.shape                                  # 10 ms hop -> 101 frames
    (2, 101, 40)
    """

    def __init__(self, deltas=False, context=False, requires_grad=False,
                 sample_rate=16000, f_min=0, f_max=None, n_fft=400, n_mels=40,
                 filter_shape="triangular", param_change_factor=1.0,
                 param_rand_factor=0.0, left_frames=5, right_frames=5,
                 win_length=25, hop_length=10):
        if f_max is None:
            f_max = sample_rate / 2
        self.deltas = deltas
        self.context = context
        self.compute_STFT = STFT(sample_rate=sample_rate, n_fft=n_fft,
                                 win_length=win_length, hop_length=hop_length)
        self.compute_fbanks = Filterbank(
            sample_rate=sample_rate, n_fft=n_fft, n_mels=n_mels, f_min=f_min,
            f_max=f_max, filter_shape=filter_shape)
        self.compute_deltas = Deltas(input_size=n_mels)
        self.context_window = ContextWindow(left_frames=left_frames,
                                            right_frames=right_frames)

    def __call__(self, params, wav):
        del params
        stft = self.compute_STFT(None, wav)
        mag = spectral_magnitude(stft)
        fbanks = self.compute_fbanks(None, mag)
        if self.deltas:
            delta1 = self.compute_deltas(None, fbanks)
            delta2 = self.compute_deltas(None, delta1)
            fbanks = jnp.concatenate([fbanks, delta1, delta2], axis=2)
        if self.context:
            fbanks = self.context_window(None, fbanks)
        return fbanks


class MFCC(Module):
    """Waveform → MFCCs (reference ``features.py:146``)."""

    def __init__(self, deltas=True, context=True, requires_grad=False,
                 sample_rate=16000, f_min=0, f_max=None, n_fft=400, n_mels=23,
                 n_mfcc=20, filter_shape="triangular", param_change_factor=1.0,
                 param_rand_factor=0.0, left_frames=5, right_frames=5,
                 win_length=25, hop_length=10):
        if f_max is None:
            f_max = sample_rate / 2
        self.deltas = deltas
        self.context = context
        self.compute_STFT = STFT(sample_rate=sample_rate, n_fft=n_fft,
                                 win_length=win_length, hop_length=hop_length)
        self.compute_fbanks = Filterbank(
            sample_rate=sample_rate, n_fft=n_fft, n_mels=n_mels, f_min=f_min,
            f_max=f_max, filter_shape=filter_shape)
        self.compute_dct = DCT(input_size=n_mels, n_out=n_mfcc)
        self.compute_deltas = Deltas(input_size=n_mfcc)
        self.context_window = ContextWindow(left_frames=left_frames,
                                            right_frames=right_frames)

    def __call__(self, params, wav):
        del params
        stft = self.compute_STFT(None, wav)
        mag = spectral_magnitude(stft)
        fbanks = self.compute_fbanks(None, mag)
        mfccs = self.compute_dct(None, fbanks)
        if self.deltas:
            delta1 = self.compute_deltas(None, mfccs)
            delta2 = self.compute_deltas(None, delta1)
            mfccs = jnp.concatenate([mfccs, delta1, delta2], axis=2)
        if self.context:
            mfccs = self.context_window(None, mfccs)
        return mfccs
