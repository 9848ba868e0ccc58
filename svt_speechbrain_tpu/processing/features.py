"""DSP feature extraction (analogue of reference
``speechbrain/processing/features.py``).

All transforms are pure jnp functions over (batch, time[, channels]) —
jit-able, batchable and TPU-resident (the frame/FFT/filterbank chain is a few
fused matmuls/FFTs, so feature extraction rides the accelerator instead of
loader workers when desired).
"""
from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module


def hamming_window(n):
    """Periodic hamming window (torch's default periodic=True)."""
    if n <= 1:
        return jnp.ones((n,), jnp.float32)
    return jnp.asarray(np.hamming(n + 1)[:-1], jnp.float32)


def hann_window(n):
    """Periodic hann window (torch's default periodic=True)."""
    if n <= 1:
        return jnp.ones((n,), jnp.float32)
    return jnp.asarray(np.hanning(n + 1)[:-1], jnp.float32)


class STFT(Module):
    """Short-term Fourier transform (reference ``features.py:50``).

    Input (batch, time) or (batch, time, channels); output
    (batch, frames, n_fft//2+1, 2[, channels]) with real/imag last-but-one —
    the reference's torch.stft layout.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> stft = STFT(sample_rate=16000, win_length=25, hop_length=10,
    ...             n_fft=400)
    >>> stft(None, jnp.zeros((2, 16000))).shape     # 1 s -> 101 frames
    (2, 101, 201, 2)
    """

    def __init__(self, sample_rate, win_length=25, hop_length=10, n_fft=400,
                 window_fn=hamming_window, normalized_stft=False, center=True,
                 pad_mode="constant", onesided=True):
        self.sample_rate = sample_rate
        self.win_length = int(round((sample_rate / 1000.0) * win_length))
        self.hop_length = int(round((sample_rate / 1000.0) * hop_length))
        self.n_fft = n_fft
        self.normalized_stft = normalized_stft
        self.center = center
        self.pad_mode = pad_mode
        self.onesided = onesided
        self.window = window_fn(self.win_length)

    def __call__(self, params, x):
        del params
        multi_channel = x.ndim == 3
        if multi_channel:  # (B, T, C) → (B*C, T)
            b, t, c = x.shape
            x = x.transpose(0, 2, 1).reshape(b * c, t)
        if self.center:
            pad = self.n_fft // 2
            mode = {"constant": "constant", "reflect": "reflect"}[self.pad_mode]
            x = jnp.pad(x, ((0, 0), (pad, pad)), mode=mode)
        # frame
        n_frames = 1 + (x.shape[1] - self.n_fft) // self.hop_length
        idx = (np.arange(self.n_fft)[None, :]
               + self.hop_length * np.arange(n_frames)[:, None])
        frames = x[:, idx]  # (B, frames, n_fft)
        win = self.window
        if self.win_length < self.n_fft:  # center window in the fft size
            lpad = (self.n_fft - self.win_length) // 2
            win = jnp.pad(win, (lpad, self.n_fft - self.win_length - lpad))
        frames = frames * win
        spec = jnp.fft.rfft(frames, n=self.n_fft, axis=-1)
        if not self.onesided:
            spec = jnp.fft.fft(frames, n=self.n_fft, axis=-1)
        if self.normalized_stft:
            spec = spec / math.sqrt(self.n_fft)
        out = jnp.stack([spec.real, spec.imag], axis=-1)  # (B, frames, F, 2)
        if multi_channel:
            out = out.reshape(b, c, n_frames, -1, 2).transpose(0, 2, 3, 4, 1)
        return out


class ISTFT(Module):
    """Inverse STFT with overlap-add + window-envelope normalization
    (reference ``features.py:191``)."""

    def __init__(self, sample_rate, win_length=25, hop_length=10, n_fft=None,
                 window_fn=hamming_window, center=True, onesided=True, epsilon=1e-12):
        self.sample_rate = sample_rate
        self.win_length = int(round((sample_rate / 1000.0) * win_length))
        self.hop_length = int(round((sample_rate / 1000.0) * hop_length))
        self.n_fft = n_fft or self.win_length
        self.window = window_fn(self.win_length)
        self.center = center
        self.onesided = onesided
        self.epsilon = epsilon

    def __call__(self, params, x, sig_length=None):
        del params
        # x: (B, frames, F, 2)
        comp = x[..., 0] + 1j * x[..., 1]
        frames = jnp.fft.irfft(comp, n=self.n_fft, axis=-1)[..., :self.win_length]
        frames = frames * self.window
        b, n_frames, w = frames.shape
        out_len = self.hop_length * (n_frames - 1) + w
        sig = jnp.zeros((b, out_len))
        norm = jnp.zeros((out_len,))
        win_sq = jnp.square(self.window)
        for_idx = np.arange(w)
        starts = self.hop_length * np.arange(n_frames)
        idx = starts[:, None] + for_idx[None, :]
        sig = sig.at[:, idx.reshape(-1)].add(frames.reshape(b, -1))
        norm = norm.at[idx.reshape(-1)].add(jnp.tile(win_sq, n_frames))
        sig = sig / jnp.maximum(norm, self.epsilon)
        if self.center:
            pad = self.n_fft // 2
            sig = sig[:, pad:]
        if sig_length is not None:
            sig = sig[:, :sig_length]
        return sig


def spectral_magnitude(stft, power=1, log=False, eps=1e-14):
    """Magnitude/power from complex stft stack (reference ``features.py:327``)."""
    spectr = stft[..., 0] ** 2 + stft[..., 1] ** 2
    if power < 1:
        spectr = spectr + 1e-30
    spectr = spectr ** power
    if log:
        return jnp.log(spectr + eps)
    return spectr


class Filterbank(Module):
    """Mel filterbank over power spectrograms (reference ``features.py:359``)."""

    def __init__(self, n_mels=40, log_mel=True, filter_shape="triangular",
                 f_min=0, f_max=8000, n_fft=400, sample_rate=16000,
                 power_spectrogram=2, amin=1e-10, ref_value=1.0, top_db=80.0,
                 freeze=True, param_change_factor=1.0, param_rand_factor=0.0):
        self.n_mels = n_mels
        self.log_mel = log_mel
        self.filter_shape = filter_shape
        self.f_min = f_min
        self.f_max = f_max
        self.n_fft = n_fft
        self.sample_rate = sample_rate
        self.power_spectrogram = power_spectrogram
        self.amin = amin
        self.ref_value = ref_value
        self.top_db = top_db
        self.freeze = freeze
        self.n_stft = n_fft // 2 + 1
        self.db_multiplier = math.log10(max(self.amin, self.ref_value))
        self.multiplier = 10 if power_spectrogram == 2 else 20

        # mel band edges
        mel = np.linspace(self._to_mel(f_min), self._to_mel(f_max), n_mels + 2)
        hz = self._to_hz(mel)
        self.band = hz[1:-1] - hz[:-2]
        self.f_central = hz[1:-1]
        all_freqs = np.linspace(0, sample_rate // 2, self.n_stft)
        self.all_freqs = all_freqs

    @staticmethod
    def _to_mel(hz):
        return 2595 * np.log10(1 + np.asarray(hz) / 700)

    @staticmethod
    def _to_hz(mel):
        return 700 * (10 ** (np.asarray(mel) / 2595) - 1)

    def _filter_matrix(self):
        f_central = self.f_central[None, :]
        band = self.band[None, :]
        all_freqs = self.all_freqs[:, None]
        if self.filter_shape == "triangular":
            slope = (all_freqs - f_central) / band
            left = slope + 1.0
            right = -slope + 1.0
            fbank = np.maximum(0, np.minimum(left, right))
        elif self.filter_shape == "rectangular":
            low = f_central - band
            high = f_central + band
            fbank = ((all_freqs > low) * (all_freqs < high)).astype(np.float32)
        else:  # gaussian
            fbank = np.exp(-0.5 * ((all_freqs - f_central) / (band / 2)) ** 2)
        return jnp.asarray(fbank, jnp.float32)  # (n_stft, n_mels)

    def __call__(self, params, spectrogram):
        del params
        fbank = self._filter_matrix()
        multi_channel = spectrogram.ndim == 4
        if multi_channel:
            b, t, f, c = spectrogram.shape
            spectrogram = spectrogram.transpose(0, 3, 1, 2).reshape(b * c, t, f)
        fbanks = jnp.matmul(spectrogram, fbank)
        if self.log_mel:
            fbanks = self._amplitude_to_DB(fbanks)
        if multi_channel:
            fbanks = fbanks.reshape(b, c, t, -1).transpose(0, 2, 3, 1)
        return fbanks

    def _amplitude_to_DB(self, x):
        x_db = self.multiplier * jnp.log10(jnp.clip(x, min=self.amin))
        x_db = x_db - self.multiplier * self.db_multiplier
        # clamp per utterance to top_db below the max
        new_x_db_max = jnp.max(x_db, axis=(-2, -1), keepdims=True) - self.top_db
        return jnp.maximum(x_db, new_x_db_max)


class DCT(Module):
    """Discrete cosine transform for MFCCs (reference ``features.py:715``)."""

    def __init__(self, input_size, n_out=20, ortho_norm=True):
        if n_out > input_size:
            raise ValueError("n_out must be <= input size")
        n = np.arange(float(input_size))
        k = np.arange(float(n_out))
        dct = np.cos(np.pi / input_size * (n[:, None] + 0.5) * k[None, :])
        if ortho_norm:
            dct[:, 0] *= 1.0 / np.sqrt(2)
            dct *= np.sqrt(2.0 / input_size)
        else:
            dct *= 2.0
        self.dct_mat = jnp.asarray(dct, jnp.float32)

    def __call__(self, params, x):
        del params
        multi_channel = x.ndim == 4
        if multi_channel:
            b, t, f, c = x.shape
            x = x.transpose(0, 3, 1, 2).reshape(b * c, t, f)
        out = jnp.matmul(x, self.dct_mat)
        if multi_channel:
            out = out.reshape(b, c, t, -1).transpose(0, 2, 3, 1)
        return out


class Deltas(Module):
    """Delta coefficients via moving-window regression
    (reference ``features.py:789``)."""

    def __init__(self, input_size, window_length=5):
        self.n = (window_length - 1) // 2
        self.denom = self.n * (self.n + 1) * (2 * self.n + 1) / 3
        kernel = np.arange(-self.n, self.n + 1, dtype=np.float32)
        self.kernel = jnp.asarray(kernel)

    def __call__(self, params, x):
        del params
        # x: (B, T, F[, C]) → conv along time per feature
        orig_ndim = x.ndim
        if orig_ndim == 4:
            b, t, f, c = x.shape
            x = x.transpose(0, 3, 1, 2).reshape(b * c, t, f)
        xt = x.transpose(0, 2, 1)  # (B, F, T)
        xt = jnp.pad(xt, ((0, 0), (0, 0), (self.n, self.n)), mode="edge")
        k = self.kernel[::-1][None, None, :]
        out = jax.vmap(lambda row: jnp.convolve(row, self.kernel[::-1], mode="valid"))(
            xt.reshape(-1, xt.shape[-1]))
        out = out.reshape(x.shape[0], x.shape[2], -1) / self.denom
        out = out.transpose(0, 2, 1)
        if orig_ndim == 4:
            out = out.reshape(b, c, t, f).transpose(0, 2, 3, 1)
        return out


class ContextWindow(Module):
    """Frame splicing: gather left/right context per frame
    (reference ``features.py:853``)."""

    def __init__(self, left_frames=0, right_frames=0):
        self.left_frames = left_frames
        self.right_frames = right_frames

    def __call__(self, params, x):
        """Reference-exact layout (``features.py:895``): per input feature f
        the context copies are CONSECUTIVE output channels
        ``out[..., f*CL + j] = x[t + j - left]`` with ZERO padding outside
        the sequence (the reference's grouped identity conv)."""
        del params
        x = jnp.asarray(x)
        orig_ndim = x.ndim
        if orig_ndim == 4:
            b, t, f, c = x.shape
            x = x.transpose(0, 3, 1, 2).reshape(b * c, t, f)
        t = x.shape[1]
        pad = max(self.left_frames, self.right_frames)
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
        pieces = []
        for j in range(self.left_frames + self.right_frames + 1):
            shift = j - self.left_frames
            pieces.append(xp[:, pad + shift: pad + shift + t])
        out = jnp.stack(pieces, axis=-1)              # (B, T, F, CL)
        out = out.reshape(out.shape[0], t, -1)        # feature-major F*CL
        if orig_ndim == 4:
            out = out.reshape(b, c, t, -1).transpose(0, 2, 3, 1)
        return out


class InputNormalization(Module):
    """Mean/variance normalization with sentence/batch/speaker/global modes
    — numerically REFERENCE-EXACT (reference ``features.py:939``;
    golden-tested in ``tests/test_features_augment.py``): per-sentence
    stats over unpadded frames with UNBIASED std clamped at eps,
    per-feature statistic VECTORS, batch mode averaging the per-sentence
    stats, the global running average's exact update order
    (first-batch init regardless of epoch, count incremented every
    training batch, updates frozen after ``update_until_epoch``), and
    host-side per-speaker dictionaries. Global/speaker statistics live in
    explicit state: ``y, state = norm(params, state, x, lengths, ...)``."""

    def __init__(self, mean_norm=True, std_norm=True, norm_type="global",
                 avg_factor=None, requires_grad=False, update_until_epoch=3):
        self.mean_norm = mean_norm
        self.std_norm = std_norm
        self.norm_type = norm_type
        self.avg_factor = avg_factor
        self.update_until_epoch = update_until_epoch
        self.eps = 1e-10

    def init_state(self):
        return {"glob_mean": jnp.zeros(()), "glob_std": jnp.ones(()),
                "count": jnp.zeros(()),
                "spk_dict_mean": {}, "spk_dict_std": {}, "spk_dict_count": {}}

    def _current_stats(self, x, lengths):
        """Per-sentence per-feature stats over unpadded frames: mean and the
        reference's UNBIASED std, clamped at eps (reference ``:1129``)."""
        t = x.shape[1]
        n = jnp.clip(jnp.round(jnp.asarray(lengths) * t), 1, t)
        mask = (jnp.arange(t)[None, :] < n[:, None]).astype(x.dtype)
        while mask.ndim < x.ndim:
            mask = mask[..., None]
        denom = jnp.sum(mask, axis=1, keepdims=True)
        mean = jnp.sum(x * mask, axis=1, keepdims=True) / denom
        var = jnp.sum(jnp.square((x - mean) * mask), axis=1, keepdims=True) \
            / jnp.maximum(denom - 1.0, 1.0)           # unbiased, like torch
        if self.mean_norm:
            cur_mean = mean[:, 0]
        else:
            cur_mean = jnp.zeros_like(mean[:, 0])
        if self.std_norm:
            cur_std = jnp.sqrt(var)[:, 0]
        else:
            cur_std = jnp.ones_like(mean[:, 0])
        cur_std = jnp.maximum(cur_std, self.eps)
        return cur_mean, cur_std                      # (B, F...)

    def __call__(self, params, state, x, lengths=None, spk_ids=None, epoch=0,
                 train=True):
        del params
        x = jnp.asarray(x)
        if lengths is None:
            lengths = jnp.ones((x.shape[0],))
        cur_mean, cur_std = self._current_stats(x, lengths)

        if self.norm_type == "sentence":
            out = (x - cur_mean[:, None]) / cur_std[:, None]
            return out, state

        if self.norm_type == "speaker":
            # host-side dictionaries, like the reference (features.py:1023)
            state = dict(state)
            spk_mean = dict(state["spk_dict_mean"])
            spk_std = dict(state["spk_dict_std"])
            spk_count = dict(state["spk_dict_count"])
            out_rows = []
            cm = np.asarray(cur_mean)
            cs = np.asarray(cur_std)
            xs = np.asarray(x)
            for i in range(x.shape[0]):
                spk = int(np.asarray(spk_ids[i]).reshape(-1)[0])
                if train:
                    if spk not in spk_mean:
                        spk_mean[spk] = cm[i]
                        spk_std[spk] = cs[i]
                        spk_count[spk] = 1
                    else:
                        spk_count[spk] += 1
                        w = (1 / spk_count[spk] if self.avg_factor is None
                             else self.avg_factor)
                        spk_mean[spk] = (1 - w) * spk_mean[spk] + w * cm[i]
                        spk_std[spk] = (1 - w) * spk_std[spk] + w * cs[i]
                    m, s = spk_mean[spk], spk_std[spk]
                elif spk in spk_mean:
                    m, s = spk_mean[spk], spk_std[spk]
                else:
                    m, s = cm[i], cs[i]
                out_rows.append((xs[i] - m) / s)
            state.update(spk_dict_mean=spk_mean, spk_dict_std=spk_std,
                         spk_dict_count=spk_count)
            return jnp.asarray(np.stack(out_rows)), state

        # batch/global: average the per-sentence stats (reference :1055)
        current_mean = jnp.mean(cur_mean, axis=0)
        current_std = jnp.mean(cur_std, axis=0)

        if self.norm_type == "batch":
            out = (x - current_mean) / current_std
            return out, state

        # global: first batch initializes regardless of epoch; later batches
        # update only while epoch < update_until_epoch; the count increments
        # on EVERY training batch (reference :1060-1078)
        count = state["count"]
        if self.avg_factor is None:
            w = 1.0 / (count + 1.0)
        else:
            w = self.avg_factor
        updated_mean = (1 - w) * state["glob_mean"] + w * current_mean
        updated_std = (1 - w) * state["glob_std"] + w * current_std
        new_mean = jnp.where(
            count == 0, current_mean,
            jnp.where(epoch < self.update_until_epoch, updated_mean,
                      state["glob_mean"] * jnp.ones_like(current_mean)))
        new_std = jnp.where(
            count == 0, current_std,
            jnp.where(epoch < self.update_until_epoch, updated_std,
                      state["glob_std"] * jnp.ones_like(current_std)))
        if train:
            new_state = {**state, "glob_mean": new_mean, "glob_std": new_std,
                         "count": count + 1.0}
            glob_mean, glob_std = new_mean, new_std
        else:
            new_state = state
            glob_mean, glob_std = state["glob_mean"], state["glob_std"]
        out = (x - glob_mean) / glob_std
        return out, new_state
