"""Negative-STOI training loss — REFERENCE-EXACT.

Mirrors ``speechbrain/nnet/loss/stoi_loss.py`` numerically end to end
(golden-tested in ``tests/test_stoi_golden.py``): per-utterance truncation
by relative length, 16 kHz -> 10 kHz kaldi windowed-sinc resample (the
reference's ``torchaudio.transforms.Resample`` is the same
compliance-kaldi algorithm our :class:`~..processing.speech_augmentation.
Resample` implements), silent-frame removal with the interleaved
non-overlapping frame split (reference ``stoi_loss.py:57``), a centered
reflect-padded power spectrogram (torchaudio ``Spectrogram`` semantics:
periodic Hann of ``win_length`` zero-centered into ``n_fft``), FFT-bin
snapped one-third-octave bands (``:16``), 30-frame envelope segments with
scale + (1+c)X clipping, and the global normalized-correlation sum
``d / (J * M)`` (``:110``).

The loss runs host-side per utterance (the reference is the same Python
loop): shapes are data-dependent after silent-frame removal, so it is
eager-only, but every op on the signal path is jnp and differentiable
(the frame mask itself is discrete and carries no gradient, exactly like
the reference's boolean indexing).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ...processing.speech_augmentation import Resample

# np.finfo("float").eps — the reference's smallVal
_SMALL = float(np.finfo("float").eps)


def thirdoct(fs, nfft, num_bands, min_freq):
    """One-third-octave band matrix with FFT-bin-snapped edges
    (reference ``stoi_loss.py:16``): each band's low/high edge is moved to
    the nearest FFT bin centre and the band covers ``[fl_bin, fh_bin)``.

    Returns ``(obm, cf)`` — the (num_bands, nfft//2+1) 0/1 matrix and the
    band centre frequencies.

    Example
    -------
    >>> obm, cf = thirdoct(10000, 512, 15, 150)
    >>> obm.shape, int(obm[0].sum()) > 0
    ((15, 257), True)
    """
    f = np.linspace(0, fs, nfft + 1)[: int(nfft / 2) + 1]
    k = np.arange(num_bands, dtype=np.float64)
    cf = (2.0 ** (1.0 / 3)) ** k * min_freq
    freq_low = min_freq * 2.0 ** ((2 * k - 1) / 6)
    freq_high = min_freq * 2.0 ** ((2 * k + 1) / 6)
    obm = np.zeros((num_bands, len(f)), np.float32)
    for i in range(num_bands):
        fl_ii = int(np.argmin(np.square(f - freq_low[i])))
        fh_ii = int(np.argmin(np.square(f - freq_high[i])))
        obm[i, fl_ii:fh_ii] = 1.0
    return obm, cf


def removeSilentFrames(x, y, dyn_range=40, N=256, K=128):
    """Drop 256-sample frames of ``x`` whose windowed energy sits more than
    ``dyn_range`` dB below the loudest frame, keeping ``y`` aligned, then
    overlap-add the kept frames back (reference ``stoi_loss.py:57``).

    The reference builds the hop-128 frame set by interleaving two
    NON-overlapping splits (offsets 0 and 128) — so a trailing frame can be
    dropped relative to a plain hop-128 framing; mirrored exactly, as is
    the single (not squared) synthesis window in the overlap-add.

    Example
    -------
    >>> import numpy as np
    >>> x = np.concatenate([np.zeros(512), np.ones(1024), np.zeros(512)])
    >>> xs, ys = removeSilentFrames(x, x.copy())
    >>> len(xs) < len(x)
    True
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    w = jnp.asarray(np.hanning(256), jnp.float32)  # symmetric, zero ends
    n = int(x.shape[0])

    def interleave(v):
        v1 = v[0: n // N * N].reshape(n // N, N)          # (n1, N)
        v2 = v[K: (n - K) // N * N + K].reshape((n - K) // N, N)
        out = jnp.zeros((v1.shape[0] + v2.shape[0], N), v.dtype)
        out = out.at[0::2].set(v1)
        return out.at[1::2].set(v2)                        # frames x N

    X = interleave(x)
    Y = interleave(y)
    energy = 20 * jnp.log10(
        jnp.sqrt((w ** 2) @ (X.T ** 2)) / 16.0 + _SMALL)
    msk = np.asarray(energy - jnp.max(energy) + dyn_range > 0)
    keep = np.where(msk)[0]

    x_sil = (X[keep] * w[None, :]).T                       # (N, kept)
    y_sil = (Y[keep] * w[None, :]).T

    def ola(v):
        return jnp.concatenate([
            v[0:K, 0],
            (v[0:K, 1:] + v[K:, 0:-1]).T.flatten(),
            v[K:N, -1],
        ], axis=0)

    return ola(x_sil), ola(y_sil)


def _spectrogram_pow2(x, n_fft=512, win_length=256, hop_length=128):
    """torchaudio ``Spectrogram(n_fft=512, win_length=256, hop_length=128,
    power=2)`` semantics: reflect-pad by ``n_fft//2``, periodic Hann of
    ``win_length`` zero-centered into an ``n_fft`` window, |rfft|^2.
    Returns (n_fft//2+1, frames)."""
    x = jnp.asarray(x, jnp.float32)
    pad = n_fft // 2
    xp = jnp.pad(x, (pad, pad), mode="reflect")
    n_frames = 1 + (xp.shape[0] - n_fft) // hop_length
    idx = (np.arange(n_fft)[None, :]
           + hop_length * np.arange(n_frames)[:, None])
    win = np.zeros(n_fft, np.float32)
    half = (n_fft - win_length) // 2
    # torch.hann_window(win_length): periodic
    win[half: half + win_length] = np.hanning(win_length + 1)[:-1]
    frames = xp[idx] * jnp.asarray(win)
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return (jnp.abs(spec) ** 2).T


_RESAMPLERS = {}


def _resample_1d(x, orig_freq, new_freq):
    key = (orig_freq, new_freq)
    if key not in _RESAMPLERS:
        _RESAMPLERS[key] = Resample(orig_freq=orig_freq, new_freq=new_freq)
    return _RESAMPLERS[key](None, jnp.asarray(x, jnp.float32)[None])[0]


def stoi_loss(y_pred_batch, y_true_batch, lens=None, reduction="mean"):
    """Negative STOI of enhanced vs clean 16 kHz waveforms
    (reference ``stoi_loss.py:110``); -1 is perfectly intelligible.

    Arguments mirror the reference: ``(B, T)`` (or ``(B, T, 1)``) degraded
    and clean batches, relative ``lens``, and ``reduction`` "mean" or
    "batch" (anything non-"mean" returns the per-utterance vector).

    Example
    -------
    >>> import numpy as np, jax.numpy as jnp
    >>> t = np.arange(16000, dtype=np.float32)
    >>> a = jnp.asarray(np.sin(t))[None]
    >>> score = -stoi_loss(a + 0.001, a, jnp.ones(1))
    >>> bool(0.69 < score < 0.81)   # reference doctest: tensor(0.7...)
    True
    """
    y_pred_batch = jnp.asarray(y_pred_batch, jnp.float32)
    y_true_batch = jnp.asarray(y_true_batch, jnp.float32)
    if y_pred_batch.ndim == 3 and y_pred_batch.shape[-1] == 1:
        y_pred_batch = y_pred_batch[..., 0]
    if y_true_batch.ndim == 3 and y_true_batch.shape[-1] == 1:
        y_true_batch = y_true_batch[..., 0]

    batch_size = y_pred_batch.shape[0]
    if lens is None:
        lens = np.ones(batch_size, np.float32)
    lens = np.asarray(lens)

    fs = 16000
    N = 30          # temporal envelope length
    J = 15.0        # number of bands
    octave_band = jnp.asarray(thirdoct(fs=10000, nfft=512, num_bands=15,
                                       min_freq=150)[0])
    c = 5.62341325  # 10^(-Beta/20), Beta = -15

    scores = []
    for i in range(batch_size):
        t = int(lens[i] * y_pred_batch.shape[1])
        y_true = _resample_1d(y_true_batch[i, :t], fs, 10000)
        y_pred = _resample_1d(y_pred_batch[i, :t], fs, 10000)

        y_sil_true, y_sil_pred = removeSilentFrames(y_true, y_pred)

        stft_true = _spectrogram_pow2(y_sil_true)
        stft_pred = _spectrogram_pow2(y_sil_pred)

        OCT_true = jnp.sqrt(octave_band @ stft_true + 1e-14)   # (15, T')
        OCT_pred = jnp.sqrt(octave_band @ stft_pred + 1e-14)

        M = int(stft_pred.shape[-1] - (N - 1))
        seg = np.arange(N)[None, :] + np.arange(M)[:, None]    # (M, 30)
        # rows m*15:(m+1)*15 = OCT[:, m:m+30]  ->  (M*15, 30)
        X = OCT_true.T[seg].transpose(0, 2, 1).reshape(M * 15, N)
        Y = OCT_pred.T[seg].transpose(0, 2, 1).reshape(M * 15, N)

        alpha = (jnp.linalg.norm(X, axis=-1, keepdims=True)
                 / (jnp.linalg.norm(Y, axis=-1, keepdims=True) + _SMALL))
        ay = Y * alpha
        yc = jnp.minimum(ay, X + X * c)

        xn = X - jnp.mean(X, axis=-1, keepdims=True)
        xn = xn / (jnp.linalg.norm(xn, axis=-1, keepdims=True) + _SMALL)
        yn = yc - jnp.mean(yc, axis=-1, keepdims=True)
        yn = yn / (jnp.linalg.norm(yn, axis=-1, keepdims=True) + _SMALL)
        scores.append(jnp.sum(xn * yn) / (J * M))

    D = jnp.stack(scores)
    if reduction == "mean":
        return -D.mean()
    return -D
