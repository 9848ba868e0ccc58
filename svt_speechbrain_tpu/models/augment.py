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
        """Warp the time axis around a random center — the reference's
        bicubic align_corners=True segment resizes (``augment.py:118``),
        expressed as one static-shape piecewise cubic gather (jittable
        with traced c/w)."""
        t = x.shape[1]
        window = self.time_warp_window
        if t - window <= window:
            return x
        k1, k2 = jax.random.split(rng)
        c = jax.random.randint(k1, (), window, t - window)
        w = jax.random.randint(k2, (), c - window, c + window) + 1
        return self._time_warp_cw(x, c, w)

    def _time_warp_cw(self, x, c, w):
        """Deterministic warp core: resize x[:, :c] to length w and
        x[:, c:] to length t-w with torch's bicubic align_corners=True,
        taps clamped within each segment."""
        t = x.shape[1]
        c = jnp.asarray(c)
        w = jnp.asarray(w)
        i = jnp.arange(t, dtype=jnp.float32)
        cf = c.astype(jnp.float32)
        wf = w.astype(jnp.float32)
        # align_corners grids per segment (guard 1-length outputs)
        left_src = i * (cf - 1) / jnp.maximum(wf - 1, 1)
        right_src = cf + (i - wf) * (t - cf - 1) / jnp.maximum(t - wf - 1, 1)
        in_left = i < wf
        src = jnp.where(in_left, left_src, right_src)
        lo_bound = jnp.where(in_left, 0, c)
        hi_bound = jnp.where(in_left, c - 1, t - 1)

        def cubic_kernel(d, a=-0.75):
            d = jnp.abs(d)
            return jnp.where(
                d <= 1, ((a + 2) * d - (a + 3)) * d * d + 1,
                jnp.where(d < 2, (((d - 5) * d + 8) * d - 4) * a, 0.0))

        x0 = jnp.floor(src)
        out = jnp.zeros_like(x)
        extra = (1,) * (x.ndim - 2)
        for k in (-1, 0, 1, 2):
            idx = jnp.clip((x0 + k).astype(jnp.int32), lo_bound, hi_bound)
            wgt = cubic_kernel(src - (x0 + k)).reshape((1, t) + extra)
            out = out + x[:, idx] * wgt
        return out

    def mask_along_axis(self, x, rng, dim, n_masks, width_range):
        """Reference draw semantics (``augment.py:149``): per-row
        (batch, n_mask) lengths in ``width_range``, positions bounded by
        ``D - max(drawn lengths)``, all masks OR-combined, filled with 0 or
        the input mean."""
        b = x.shape[0]
        size = x.shape[dim]
        k_len, k_pos = jax.random.split(rng)
        mask_len = jax.random.randint(k_len, (b, n_masks), width_range[0],
                                      width_range[1])
        mask_pos = jax.random.randint(
            k_pos, (b, n_masks), 0, jnp.maximum(1, size - mask_len.max()))
        return self._mask(x, mask_pos, mask_len, dim)

    def _mask(self, x, mask_pos, mask_len, dim):
        """Deterministic masking core for given (batch, n_mask) draws."""
        size = x.shape[dim]
        ar = jnp.arange(size)[None, None, :]
        span = ((jnp.asarray(mask_pos)[:, :, None] <= ar)
                & (ar < (jnp.asarray(mask_pos)
                         + jnp.asarray(mask_len))[:, :, None]))
        span = span.any(axis=1)                      # (B, size)
        mask_value = 0.0 if self.replace_with_zero else jnp.mean(x)
        shape = [x.shape[0]] + [1] * (x.ndim - 1)
        shape[dim] = size
        return jnp.where(span.reshape(shape), mask_value, x)


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
                 babble_snr_low=0, babble_snr_high=0, reverb_csv=None,
                 noise_csv=None, rir_scale_factor=1.0, pad_noise=False,
                 rir_funct=None, noise_funct=None, **unused):
        self.add_reverb = AddReverb(csv_file=reverb_csv,
                                    reverb_prob=reverb_prob,
                                    rir_scale_factor=rir_scale_factor,
                                    rir_funct=rir_funct)
        self.babble_speaker_count = babble_speaker_count
        if babble_speaker_count > 0:
            self.add_babble = AddBabble(
                mix_prob=babble_prob, speaker_count=babble_speaker_count,
                snr_low=babble_snr_low, snr_high=babble_snr_high)
        self.add_noise = AddNoise(csv_file=noise_csv, mix_prob=noise_prob,
                                  snr_low=noise_snr_low,
                                  snr_high=noise_snr_high,
                                  pad_noise=pad_noise,
                                  noise_funct=noise_funct)

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
