"""Augmentation lobes (analogue of reference ``speechbrain/lobes/augment.py``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module
from svt_speechbrain_tpu.processing.speech_augmentation import (
    SpeedPerturb, DropFreq, DropChunk, AddNoise, AddReverb, AddBabble,
)


class SpecAugment(Module):
    """Time/frequency masking + time warp over spectrograms
    (reference ``augment.py:32``). Static shapes: masks are built with
    broadcasted comparisons; warp uses linear interpolation.

    Example
    -------
    >>> import jax, jax.numpy as jnp, numpy as np
    >>> aug = SpecAugment(time_warp=False, freq_mask_width=(2, 4),
    ...                   time_mask_width=(2, 4))
    >>> x = jnp.ones((1, 50, 40))
    >>> out = aug(None, x, rng=jax.random.PRNGKey(3))
    >>> out.shape
    (1, 50, 40)
    >>> bool((np.asarray(out) == 0).any())      # masks zero entries out
    True
    >>> bool(np.array_equal(np.asarray(aug(None, x)), np.asarray(x)))
    True
    """

    def __init__(self, time_warp=True, time_warp_window=5, time_warp_mode="bicubic",
                 freq_mask=True, n_freq_mask=2, time_mask=True, n_time_mask=2,
                 replace_with_zero=True, freq_mask_width=(0, 20),
                 time_mask_width=(0, 100)):
        self.apply_time_warp = time_warp
        self.time_warp_window = time_warp_window
        self.freq_mask = freq_mask
        self.n_freq_mask = n_freq_mask
        self.time_mask = time_mask
        self.n_time_mask = n_time_mask
        self.replace_with_zero = replace_with_zero
        self.freq_mask_width = freq_mask_width
        self.time_mask_width = time_mask_width

    def __call__(self, params, x, rng=None):
        del params
        if rng is None:
            return x
        k_warp, k_f, k_t = jax.random.split(rng, 3)
        if self.apply_time_warp:
            x = self.time_warp(x, k_warp)
        if self.freq_mask:
            x = self.mask_along_axis(x, k_f, dim=2, n_masks=self.n_freq_mask,
                                     width_range=self.freq_mask_width)
        if self.time_mask:
            x = self.mask_along_axis(x, k_t, dim=1, n_masks=self.n_time_mask,
                                     width_range=self.time_mask_width)
        return x

    def time_warp(self, x, rng):
        """Shift the spectrogram center by ±window frames with linear
        interpolation (reference ``augment.py:100``)."""
        b, t = x.shape[0], x.shape[1]
        window = self.time_warp_window
        if t - window <= window:
            return x
        k1, k2 = jax.random.split(rng)
        c = jax.random.randint(k1, (), window, t - window)
        w = jax.random.randint(k2, (), c - window, c + window) + 1
        # piecewise-linear index map: [0, c] → [0, w], [c, t) → [w, t)
        pos = jnp.arange(t, dtype=jnp.float32)
        left = pos * (w.astype(jnp.float32) / jnp.maximum(c, 1))
        right = w + (pos - c) * ((t - 1 - w).astype(jnp.float32)
                                 / jnp.maximum(t - 1 - c, 1))
        src = jnp.where(pos <= c, left, right)
        lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, t - 1)
        hi = jnp.clip(lo + 1, 0, t - 1)
        frac = (src - lo).reshape((1, t) + (1,) * (x.ndim - 2))
        return x[:, lo] * (1 - frac) + x[:, hi] * frac

    def mask_along_axis(self, x, rng, dim, n_masks, width_range):
        b = x.shape[0]
        size = x.shape[dim]
        ar = jnp.arange(size)
        mask_value = 0.0 if self.replace_with_zero else jnp.mean(x)
        out = x
        for i in range(n_masks):
            k_len, k_pos = jax.random.split(jax.random.fold_in(rng, i))
            length = jax.random.randint(k_len, (b,), width_range[0], width_range[1])
            start = jax.random.randint(k_pos, (b,), 0,
                                       jnp.maximum(size - width_range[1], 1))
            span = (ar[None, :] >= start[:, None]) & (ar[None, :] < (start + length)[:, None])
            shape = [b] + [1] * (x.ndim - 1)
            shape[dim] = size
            out = jnp.where(span.reshape(shape), mask_value, out)
        return out


class TimeDomainSpecAugment(Module):
    """Waveform-domain augmentation chain: drop_freq → drop_chunk →
    speed_perturb (reference ``augment.py:203``)."""

    def __init__(self, perturb_prob=1.0, drop_freq_prob=1.0, drop_chunk_prob=1.0,
                 speeds=[95, 100, 105], sample_rate=16000, drop_freq_count_low=0,
                 drop_freq_count_high=3, drop_chunk_count_low=0,
                 drop_chunk_count_high=5, drop_chunk_length_low=1000,
                 drop_chunk_length_high=2000, drop_chunk_noise_factor=0):
        self.speed_perturb = SpeedPerturb(
            perturb_prob=perturb_prob, orig_freq=sample_rate, speeds=speeds)
        self.drop_freq = DropFreq(
            drop_prob=drop_freq_prob, drop_count_low=drop_freq_count_low,
            drop_count_high=drop_freq_count_high)
        self.drop_chunk = DropChunk(
            drop_prob=drop_chunk_prob, drop_count_low=drop_chunk_count_low,
            drop_count_high=drop_chunk_count_high,
            drop_length_low=drop_chunk_length_low,
            drop_length_high=drop_chunk_length_high,
            noise_factor=drop_chunk_noise_factor)

    def __call__(self, params, waveforms, lengths=None, rng=None):
        del params
        if rng is None:
            return waveforms
        k1, k2, k3 = jax.random.split(rng, 3)
        waveforms = self.speed_perturb(None, waveforms, rng=k1)
        waveforms = self.drop_freq(None, waveforms, rng=k2)
        waveforms = self.drop_chunk(None, waveforms, lengths=lengths, rng=k3)
        return waveforms


class EnvCorrupt(Module):
    """Environmental corruption: reverb + babble + noise
    (reference ``augment.py:301``)."""

    def __init__(self, reverb_prob=1.0, babble_prob=1.0, noise_prob=1.0,
                 noise_snr_low=0, noise_snr_high=0, babble_speaker_count=0,
                 babble_snr_low=0, babble_snr_high=0, rir_funct=None,
                 noise_funct=None, **unused):
        self.add_reverb = AddReverb(reverb_prob=reverb_prob, rir_funct=rir_funct)
        self.babble_speaker_count = babble_speaker_count
        if babble_speaker_count > 0:
            self.add_babble = AddBabble(
                mix_prob=babble_prob, speaker_count=babble_speaker_count,
                snr_low=babble_snr_low, snr_high=babble_snr_high)
        self.add_noise = AddNoise(mix_prob=noise_prob, snr_low=noise_snr_low,
                                  snr_high=noise_snr_high, noise_funct=noise_funct)

    def __call__(self, params, waveforms, lengths=None, rng=None):
        del params
        if rng is None:
            return waveforms
        k1, k2, k3 = jax.random.split(rng, 3)
        waveforms = self.add_reverb(None, waveforms, rng=k1)
        if self.babble_speaker_count > 0:
            waveforms = self.add_babble(None, waveforms, lengths=lengths, rng=k2)
        waveforms = self.add_noise(None, waveforms, lengths=lengths, rng=k3)
        return waveforms
