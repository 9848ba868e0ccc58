"""Waveform-domain augmentation (analogue of reference
``speechbrain/processing/speech_augmentation.py``).

All modules are pure functions of (params, x, lengths, rng) with static
shapes — random spans become masks, random resampling factors pick from a
static set of branches — so they fuse into the jitted train step.
"""
from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module
from svt_speechbrain_tpu.processing.signal_processing import (
    compute_amplitude, dB_to_amplitude, notch_filter, convolve1d, reverberate,
)


class AddNoise(Module):
    """Mix noise at a random SNR — reference-exact mixing semantics
    (reference ``speech_augmentation.py:30``; golden-tested in
    ``tests/test_addnoise_golden.py``): one scalar mix_prob draw for the
    whole batch, per-row SNR factors, a noise CORPUS loaded host-side from
    an extended CSV (with ``pad_noise`` looping and ``start_index``
    slicing, amplitude-normalized to the target), and the reference's
    UNnormalized white-noise fallback ``noisy += new_amp * randn`` when no
    corpus is given. ``noise_funct`` is a TPU-side extension: a callable
    ``(key, shape) -> noise`` treated like a corpus batch (normalized)."""

    def __init__(self, csv_file=None, csv_keys=None, sorting="random",
                 snr_low=0, snr_high=0, pad_noise=False, mix_prob=1.0,
                 start_index=None, normalize=False, replacements={},
                 noise_funct=None):
        self.csv_file = csv_file
        self.csv_keys = csv_keys
        self.sorting = sorting
        self.snr_low = snr_low
        self.snr_high = snr_high
        self.pad_noise = pad_noise
        self.mix_prob = mix_prob
        self.start_index = start_index
        self.normalize = normalize
        self.replacements = replacements
        self.noise_funct = noise_funct  # callable (key, shape) -> noise

    # ------------------------------------------------ noise corpus loading

    def _load_noise_batch(self):
        """Next corpus batch as (wavs (B, T), relative lens) — host-side
        (reference ``:428``), looping the loader at epoch end."""
        if not hasattr(self, "_noise_iter"):
            from svt_speechbrain_tpu.dataio.dataloader import make_dataloader
            from svt_speechbrain_tpu.dataio.legacy import ExtendedCSVDataset

            dataset = ExtendedCSVDataset(
                csvpath=self.csv_file, output_keys=self.csv_keys or (),
                sorting=self.sorting if self.sorting != "random"
                else "original", replacements=self.replacements)
            self._noise_loader = make_dataloader(
                dataset, batch_size=self._noise_batch_size,
                shuffle=(self.sorting == "random"))
            self._noise_iter = iter(self._noise_loader)
        try:
            batch = next(self._noise_iter)
        except StopIteration:
            self._noise_iter = iter(self._noise_loader)
            batch = next(self._noise_iter)
        wavs, lens = batch.at_position(0)
        return np.asarray(wavs), np.asarray(lens)

    def _load_noise_batch_of_size(self, batch_size):
        noise_batch, noise_lens = self._load_noise_batch()
        while len(noise_batch) < batch_size:
            added, added_lens = self._load_noise_batch()
            # pad the shorter set to the longer's length, fix relative lens
            if added.shape[1] > noise_batch.shape[1]:
                noise_lens = noise_lens * noise_batch.shape[1] / added.shape[1]
                noise_batch = np.pad(
                    noise_batch,
                    ((0, 0), (0, added.shape[1] - noise_batch.shape[1])))
            elif noise_batch.shape[1] > added.shape[1]:
                added_lens = added_lens * added.shape[1] / noise_batch.shape[1]
                added = np.pad(
                    added, ((0, 0), (0, noise_batch.shape[1] - added.shape[1])))
            noise_batch = np.concatenate([noise_batch, added])
            noise_lens = np.concatenate([noise_lens, added_lens])
        return noise_batch[:batch_size], noise_lens[:batch_size]

    def _load_noise(self, lengths_abs, max_length, key):
        """Reference ``:164``: batch of corpus noise covering the speech."""
        batch_size = len(lengths_abs)
        self._noise_batch_size = batch_size
        noise_batch, noise_rel = self._load_noise_batch_of_size(batch_size)
        # reference ``:198`` TRUNCATES (.long()), not rounds
        noise_len = (noise_rel * noise_batch.shape[1]).astype(np.int64)
        if self.pad_noise:
            while np.any(noise_len < lengths_abs):
                min_len = int(noise_len.min())
                noise_batch = np.concatenate(
                    [noise_batch[:, :min_len], noise_batch], axis=1)
                noise_len = noise_len + min_len
        elif noise_batch.shape[1] < max_length:
            noise_batch = np.pad(
                noise_batch, ((0, 0), (0, max_length - noise_batch.shape[1])))
        start_index = self.start_index
        if start_index is None:
            max_chop = max(int((noise_len - lengths_abs).min()), 1)
            start_index = int(jax.random.randint(key, (), 0, max_chop))
        noise_batch = noise_batch[:, start_index: start_index + max_length]
        noise_len = np.minimum(noise_len - start_index, max_length)[:, None]
        return jnp.asarray(noise_batch), jnp.asarray(noise_len)

    def __call__(self, params, waveforms, lengths=None, rng=None):
        del params
        if rng is None:
            return waveforms
        b, t = waveforms.shape[:2]
        lengths = jnp.ones((b,)) if lengths is None else jnp.asarray(lengths)
        abs_len = (lengths * t)[:, None]
        k_mix, k_snr, k_noise, k_start = jax.random.split(rng, 4)

        # one scalar draw for the whole batch, like the reference (:137)
        if float(jax.random.uniform(k_mix, ())) > self.mix_prob:
            return waveforms

        clean_amplitude = compute_amplitude(waveforms, abs_len)
        snr = jax.random.uniform(k_snr, (b, 1), minval=self.snr_low,
                                 maxval=self.snr_high)
        factor = 1 / (dB_to_amplitude(snr) + 1)
        new_noise_amplitude = factor * clean_amplitude
        noisy = waveforms * (1 - factor)

        if self.noise_funct is not None:
            noise = jnp.asarray(self.noise_funct(k_noise, waveforms.shape))
            noise_amplitude = compute_amplitude(noise, abs_len)
            noisy = noisy + noise * (new_noise_amplitude
                                     / (noise_amplitude + 1e-14))
        elif self.csv_file is None:
            # the reference's white-noise fallback is UNnormalized (:151)
            noisy = noisy + new_noise_amplitude \
                * jax.random.normal(k_noise, waveforms.shape)
        else:
            # reference ``:166`` TRUNCATES (.long()), not rounds
            lengths_abs = (np.asarray(lengths) * t).astype(np.int64)
            noise_batch, noise_len = self._load_noise(lengths_abs, t, k_start)
            noise_amplitude = compute_amplitude(noise_batch, noise_len)
            noisy = noisy + noise_batch * (new_noise_amplitude
                                           / (noise_amplitude + 1e-14))

        if self.normalize:
            peak = jnp.max(jnp.abs(noisy), axis=1, keepdims=True)
            noisy = noisy / jnp.maximum(peak, 1.0)
        return noisy


class AddReverb(Module):
    """Convolve with an impulse response (reference ``:279``;
    golden-tested in ``tests/test_addnoise_golden.py``): RIRs come from an
    extended-CSV corpus (host-side loader looping like the reference) or a
    ``rir_funct`` callable; ``rir_scale_factor`` compresses/dilates the RIR
    with the reference's linear interpolation; one scalar ``reverb_prob``
    draw gates the whole batch; ``reverberate(..., rescale_amp="avg")``."""

    def __init__(self, csv_file=None, sorting="random", reverb_prob=1.0,
                 rir_scale_factor=1.0, replacements={}, rir_funct=None):
        self.csv_file = csv_file
        self.sorting = sorting
        self.reverb_prob = reverb_prob
        self.rir_scale_factor = rir_scale_factor
        self.replacements = replacements
        self.rir_funct = rir_funct

    def _load_rir(self):
        """Next corpus RIR (host-side), looping at epoch end
        (reference ``:372``)."""
        if not hasattr(self, "_rir_iter"):
            from svt_speechbrain_tpu.dataio.dataloader import make_dataloader
            from svt_speechbrain_tpu.dataio.legacy import ExtendedCSVDataset

            dataset = ExtendedCSVDataset(
                csvpath=self.csv_file,
                sorting=self.sorting if self.sorting != "random"
                else "original", replacements=self.replacements)
            self._rir_loader = make_dataloader(
                dataset, shuffle=(self.sorting == "random"))
            self._rir_iter = iter(self._rir_loader)
        try:
            batch = next(self._rir_iter)
        except StopIteration:
            self._rir_iter = iter(self._rir_loader)
            batch = next(self._rir_iter)
        rir, _ = batch.at_position(0)
        return jnp.asarray(np.asarray(rir))

    @staticmethod
    def _interpolate_linear(rir, scale_factor):
        """torch F.interpolate(mode="linear", align_corners=False) on the
        time axis of (B, T) arrays."""
        t_in = rir.shape[1]
        t_out = int(np.floor(t_in * scale_factor))
        # align_corners=False sampling grid
        pos = (np.arange(t_out) + 0.5) / scale_factor - 0.5
        pos = np.clip(pos, 0, t_in - 1)
        left = np.floor(pos).astype(np.int64)
        right = np.minimum(left + 1, t_in - 1)
        frac = jnp.asarray(pos - left)
        return rir[:, left] * (1 - frac) + rir[:, right] * frac

    def __call__(self, params, waveforms, lengths=None, rng=None):
        del params, lengths
        if rng is None:
            return waveforms
        k1, k2 = jax.random.split(rng)
        # one scalar draw for the whole batch, like the reference (:333)
        if float(jax.random.uniform(k2, ())) > self.reverb_prob:
            return waveforms
        if self.rir_funct is not None:
            rir = jnp.asarray(self.rir_funct(k1))
        elif self.csv_file is not None:
            rir = self._load_rir()
        else:
            return waveforms
        if rir.ndim == 1:
            rir = rir[None]
        if self.rir_scale_factor != 1:
            rir = self._interpolate_linear(rir, self.rir_scale_factor)
        return reverberate(waveforms, rir, rescale_amp="avg")


class SpeedPerturb(Module):
    """Resample-based speed perturbation (reference ``:403``): pick one of
    ``speeds`` (percent) per batch. Static shapes: each speed is a separate
    branch via ``lax.switch``; outputs are cut/padded to the input length."""

    def __init__(self, orig_freq, speeds=[90, 100, 110], perturb_prob=1.0):
        self.orig_freq = orig_freq
        self.speeds = speeds
        self.perturb_prob = perturb_prob
        self.resamplers = [
            Resample(orig_freq=orig_freq, new_freq=orig_freq * speed // 100)
            for speed in speeds
        ]

    def __call__(self, params, waveform, lengths=None, rng=None):
        del params, lengths
        if rng is None:
            return waveform
        k1, k2 = jax.random.split(rng)
        t = waveform.shape[1]

        def branch(resampler):
            def fn(wav):
                out = resampler(None, wav)
                if out.shape[1] >= t:
                    return out[:, :t]
                return jnp.pad(out, ((0, 0), (0, t - out.shape[1])))
            return fn

        idx = jax.random.randint(k1, (), 0, len(self.speeds))
        perturbed = jax.lax.switch(idx, [branch(r) for r in self.resamplers], waveform)
        keep = jax.random.uniform(k2, ()) > self.perturb_prob
        return jnp.where(keep, waveform, perturbed)


class Resample(Module):
    """Kaldi-compatible LinearResample — numerically REFERENCE-EXACT
    (reference ``:479``, after torchaudio.compliance.kaldi; golden-tested
    in ``tests/test_resample_golden.py``): raised-cosine-windowed sinc
    filters at ``new_freq``-spaced output instants, the exact tick-based
    output length, and the phase/first-index layout. The reference's
    per-phase conv loop becomes one gather + einsum over static index
    grids (precomputed at init), so the whole op jits."""

    def __init__(self, orig_freq=16000, new_freq=16000, lowpass_filter_width=6):
        self.orig_freq = int(orig_freq)
        self.new_freq = int(new_freq)
        self.lowpass_filter_width = lowpass_filter_width
        base_freq = math.gcd(self.orig_freq, self.new_freq)
        self.conv_stride = self.orig_freq // base_freq
        self.output_samples = self.new_freq // base_freq
        if self.orig_freq != self.new_freq:
            self._make_weights()

    def _make_weights(self):
        """The reference's ``_indices_and_weights`` (``:715``), in numpy."""
        min_freq = min(self.orig_freq, self.new_freq)
        lowpass_cutoff = 0.99 * 0.5 * min_freq
        window_width = self.lowpass_filter_width / (2.0 * lowpass_cutoff)
        output_t = np.arange(self.output_samples, dtype=np.float64) \
            / self.new_freq
        min_input_index = np.ceil((output_t - window_width) * self.orig_freq)
        max_input_index = np.floor((output_t + window_width) * self.orig_freq)
        num_indices = max_input_index - min_input_index + 1
        max_weight_width = int(num_indices.max())
        j = np.arange(max_weight_width, dtype=np.float64)
        input_index = min_input_index[:, None] + j[None, :]
        delta_t = input_index / self.orig_freq - output_t[:, None]
        weights = np.zeros_like(delta_t)
        inside = np.abs(delta_t) < window_width
        weights[inside] = 0.5 * (1 + np.cos(
            2 * np.pi * lowpass_cutoff / self.lowpass_filter_width
            * delta_t[inside]))
        nonzero = delta_t != 0.0
        weights[nonzero] *= (np.sin(2 * np.pi * lowpass_cutoff
                                    * delta_t[nonzero])
                             / (np.pi * delta_t[nonzero]))
        weights[~nonzero] *= 2 * lowpass_cutoff
        weights /= self.orig_freq
        self.first_indices = min_input_index.astype(np.int64)
        self.weights = weights.astype(np.float32)   # (P, W)

    def _output_samples(self, input_num_samp):
        """Exact tick-based output length (reference ``:659``)."""
        samp_in, samp_out = self.orig_freq, self.new_freq
        tick_freq = abs(samp_in * samp_out) // math.gcd(samp_in, samp_out)
        ticks_per_input_period = tick_freq // samp_in
        interval_length = input_num_samp * ticks_per_input_period
        if interval_length <= 0:
            return 0
        ticks_per_output_period = tick_freq // samp_out
        last_output_samp = interval_length // ticks_per_output_period
        if last_output_samp * ticks_per_output_period == interval_length:
            last_output_samp -= 1
        return last_output_samp + 1

    def __call__(self, params, waveforms):
        del params
        if self.orig_freq == self.new_freq:
            return waveforms
        waveforms = jnp.asarray(waveforms)
        squeezed = False
        if waveforms.ndim == 2:
            x = waveforms[:, :, None]      # (B, T, C=1)
            squeezed = True
        else:
            x = waveforms
        b, t, c = x.shape
        p, w = self.weights.shape
        tot_output_samp = self._output_samples(t)
        n_blocks = -(-tot_output_samp // p)   # output rows per phase

        # gather grid: sample for (phase i, block n, tap j) lives at
        # first_indices[i] + n*conv_stride + j in the (padded) signal
        pad_left = int(max(0, -self.first_indices.min()))
        starts = (self.first_indices[:, None] + pad_left
                  + np.arange(n_blocks)[None, :] * self.conv_stride)  # (P, N)
        idx = starts[:, :, None] + np.arange(w)[None, None, :]        # (P,N,W)
        pad_right = int(max(0, idx.max() + 1 - (t + pad_left)))
        xp = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)))
        windows = xp[:, jnp.asarray(idx.reshape(-1)), :].reshape(
            b, p, n_blocks, w, c)
        out = jnp.einsum("bpnwc,pw->bnpc", windows,
                         jnp.asarray(self.weights))
        out = out.reshape(b, n_blocks * p, c)[:, :tot_output_samp]
        return out[:, :, 0] if squeezed else out


class AddBabble(Module):
    """Simulate babble by rotating other batch utterances in
    (reference ``:792``)."""

    def __init__(self, speaker_count=3, snr_low=0, snr_high=0, mix_prob=1.0):
        self.speaker_count = speaker_count
        self.snr_low = snr_low
        self.snr_high = snr_high
        self.mix_prob = mix_prob

    def __call__(self, params, waveforms, lengths=None, rng=None):
        del params
        if rng is None:
            return waveforms
        b, t = waveforms.shape[:2]
        lengths = jnp.ones((b,)) if lengths is None else jnp.asarray(lengths)
        abs_len = (lengths * t)[:, None]
        k1, k2 = jax.random.split(rng)
        clean_amplitude = compute_amplitude(waveforms, abs_len)
        snr = jax.random.uniform(k1, (b, 1), minval=self.snr_low, maxval=self.snr_high)
        factor = 1 / (dB_to_amplitude(snr) + 1)
        noise_amplitude = factor * clean_amplitude
        out = waveforms * (1 - factor)
        babble = jnp.roll(waveforms, 1, axis=0)
        for i in range(1, self.speaker_count):
            babble = babble + jnp.roll(waveforms, 1 + i, axis=0)
        babble_amp = compute_amplitude(babble, abs_len)
        babble = babble * (noise_amplitude / (babble_amp + 1e-14))
        noisy = out + babble
        keep = jax.random.uniform(k2, (b, 1)) > self.mix_prob
        return jnp.where(keep, waveforms, noisy)


class DropFreq(Module):
    """Random notch filters in the frequency domain (reference ``:876``)."""

    def __init__(self, drop_freq_low=1e-14, drop_freq_high=1, drop_count_low=1,
                 drop_count_high=2, drop_width=0.05, drop_prob=1):
        self.drop_freq_low = drop_freq_low
        self.drop_freq_high = drop_freq_high
        self.drop_count_low = drop_count_low
        self.drop_count_high = drop_count_high
        self.drop_width = drop_width
        self.drop_prob = drop_prob

    def __call__(self, params, waveforms, rng=None):
        del params
        if rng is None:
            return waveforms
        keys = jax.random.split(rng, self.drop_count_high + 2)
        # one scalar draw per batch, like the reference (:906)
        if float(jax.random.uniform(keys[-1], ())) > self.drop_prob:
            return waveforms
        dropped = waveforms[..., None] if waveforms.ndim == 2 else waveforms
        drop_count = jax.random.randint(
            keys[0], (), self.drop_count_low, self.drop_count_high + 1)
        filter_length = 101
        pad = filter_length // 2
        inputs = jnp.arange(filter_length, dtype=jnp.float32) - pad
        # torch.blackman_window default = periodic
        blackman = jnp.asarray(np.blackman(filter_length + 1)[:-1],
                               jnp.float32)
        drop_w = self.drop_width

        def raw_sinc(x):
            return jnp.where(x == 0, 1.0, jnp.sin(x) / jnp.where(x == 0, 1.0,
                                                                 x))

        def notch_kernel(freq):
            # reference notch_filter math at a TRACED frequency (:372-427)
            freq = freq + drop_w
            lo = raw_sinc(3 * (freq - drop_w) * inputs) * blackman
            lo = lo / jnp.sum(lo)
            hi = raw_sinc(3 * (freq + drop_w) * inputs) * blackman
            hi = (-(hi / jnp.sum(hi))).at[pad].add(1.0)
            return (lo + hi)[None, :, None]

        # compose ALL notches into one truncated filter on a delta, then
        # apply once — the reference's structure (:928-941)
        drop_filter = jnp.zeros((1, filter_length, 1)).at[0, pad, 0].set(1.0)
        for i in range(self.drop_count_high):
            freq = jax.random.uniform(keys[i + 1], (),
                                      minval=self.drop_freq_low,
                                      maxval=self.drop_freq_high)
            composed = convolve1d(drop_filter, notch_kernel(freq),
                                  padding=pad)
            drop_filter = jnp.where(i < drop_count, composed, drop_filter)
        out = convolve1d(dropped, drop_filter, padding=pad)
        return out[..., 0] if waveforms.ndim == 2 else out


class DropChunk(Module):
    """Zero (or noise-fill) random time chunks (reference ``:980``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> drop = DropChunk(drop_length_low=20, drop_length_high=40,
    ...                  drop_count_low=1, drop_count_high=2)
    >>> wav = jnp.ones((1, 400))
    >>> out = drop({}, wav, rng=jax.random.PRNGKey(0))
    >>> bool((out == 0).any()), bool((out == 1).any())   # chunks zeroed
    (True, True)
    >>> bool((drop({}, wav) == wav).all())               # no rng: identity
    True
    """

    def __init__(self, drop_length_low=100, drop_length_high=1000,
                 drop_count_low=1, drop_count_high=10, drop_start=0,
                 drop_end=None, drop_prob=1, noise_factor=0.0):
        self.drop_length_low = drop_length_low
        self.drop_length_high = drop_length_high
        self.drop_count_low = drop_count_low
        self.drop_count_high = drop_count_high
        self.drop_start = drop_start
        self.drop_end = drop_end
        self.drop_prob = drop_prob
        self.noise_factor = noise_factor

    def __call__(self, params, waveforms, lengths=None, rng=None):
        del params
        if rng is None:
            return waveforms
        b, t = waveforms.shape[:2]
        lengths = jnp.ones((b,)) if lengths is None else jnp.asarray(lengths)
        abs_len = lengths * t
        keys = jax.random.split(rng, 4)
        drop_counts = jax.random.randint(
            keys[0], (b,), self.drop_count_low, self.drop_count_high + 1)
        mask = jnp.ones((b, t), waveforms.dtype)
        ar = jnp.arange(t)[None, :]
        for i in range(self.drop_count_high):
            ki = jax.random.fold_in(keys[1], i)
            k_len, k_start = jax.random.split(ki)
            length = jax.random.randint(k_len, (b,), self.drop_length_low,
                                        self.drop_length_high + 1)
            end = self.drop_end if self.drop_end is not None else t
            if end < 0:
                end = t + end
            start_max = jnp.maximum(end - length, self.drop_start + 1)
            start = jax.random.randint(k_start, (b,), self.drop_start,
                                       jnp.maximum(self.drop_start + 1, 1)) * 0 + (
                jax.random.uniform(k_start, (b,)) * (start_max - self.drop_start)
            ).astype(jnp.int32) + self.drop_start
            span = (ar >= start[:, None]) & (ar < (start + length)[:, None])
            active = (i < drop_counts)[:, None]
            mask = jnp.where(span & active, 0.0, mask)
        dropped = waveforms * mask
        if self.noise_factor > 0:
            clean_amplitude = compute_amplitude(waveforms, abs_len[:, None])
            noise = jax.random.uniform(keys[2], waveforms.shape, minval=-1, maxval=1)
            noise = noise * 2 * clean_amplitude * self.noise_factor
            dropped = dropped + noise * (1 - mask)
        keep = jax.random.uniform(keys[3], (b, 1)) > self.drop_prob
        return jnp.where(keep, waveforms, dropped)


class DoClip(Module):
    """Random amplitude clipping (reference ``:1143``)."""

    def __init__(self, clip_low=0.5, clip_high=1, clip_prob=1):
        self.clip_low = clip_low
        self.clip_high = clip_high
        self.clip_prob = clip_prob

    def __call__(self, params, waveforms, rng=None):
        del params
        if rng is None:
            return waveforms
        k1, k2 = jax.random.split(rng)
        clip_value = jax.random.uniform(k1, (), minval=self.clip_low,
                                        maxval=self.clip_high)
        clipped = jnp.clip(waveforms, -clip_value, clip_value)
        keep = jax.random.uniform(k2, ()) > self.clip_prob
        return jnp.where(keep, waveforms, clipped)
