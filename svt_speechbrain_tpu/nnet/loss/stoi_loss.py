"""STOI loss (analogue of reference ``speechbrain/nnet/loss/stoi_loss.py``):
negative short-time objective intelligibility as a differentiable training
objective for enhancement models.

Implements the standard STOI pipeline in jnp: 10 kHz resample (callers feed
10 kHz or accept linear-interp resampling), 512-point STFT with 256 window,
15 one-third-octave bands over 150 Hz–5 kHz, 30-frame segments,
clip+correlate."""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _thirdoct(fs=10000, nfft=512, num_bands=15, min_freq=150):
    f = np.linspace(0, fs / 2, nfft // 2 + 1)
    k = np.arange(num_bands)
    cf = 2.0 ** (k / 3.0) * min_freq
    fl = np.sqrt(cf * cf / 2.0 ** (1.0 / 3.0))
    fr = np.sqrt(cf * cf * 2.0 ** (1.0 / 3.0))
    A = np.zeros((num_bands, len(f)))
    for i in range(num_bands):
        A[i, (f >= fl[i]) & (f < fr[i])] = 1.0
    return A


def stoi_measure(clean, enhanced, fs=10000, frame_len=256, nfft=512,
                 num_bands=15, seg_len=30, beta_db=-15.0, eps=1e-9):
    """Differentiable STOI estimate for one pair of equal-length signals."""
    clean = jnp.asarray(clean, jnp.float32)
    enhanced = jnp.asarray(enhanced, jnp.float32)
    hop = frame_len // 2
    n_frames = 1 + (clean.shape[-1] - frame_len) // hop
    idx = (np.arange(frame_len)[None] + hop * np.arange(n_frames)[:, None])
    window = jnp.asarray(np.hanning(frame_len + 2)[1:-1], jnp.float32)

    def spec(x):
        frames = x[idx] * window
        return jnp.abs(jnp.fft.rfft(frames, n=nfft, axis=-1))  # (F, nfft/2+1)

    X = spec(clean)
    Y = spec(enhanced)
    octave = jnp.asarray(_thirdoct(fs, nfft, num_bands), jnp.float32)
    Xb = jnp.sqrt(X ** 2 @ octave.T + eps)  # (frames, bands)
    Yb = jnp.sqrt(Y ** 2 @ octave.T + eps)

    n_seg = Xb.shape[0] - seg_len + 1
    if n_seg <= 0:
        raise ValueError("signal too short for STOI")
    seg_idx = np.arange(seg_len)[None] + np.arange(n_seg)[:, None]
    Xs = Xb[seg_idx]  # (segments, seg_len, bands)
    Ys = Yb[seg_idx]

    # scale + clip the degraded segments (standard STOI)
    alpha = jnp.sqrt(jnp.sum(Xs ** 2, axis=1, keepdims=True)
                     / (jnp.sum(Ys ** 2, axis=1, keepdims=True) + eps))
    Ys_scaled = Ys * alpha
    clip = Xs * (1 + 10 ** (-beta_db / 20.0))
    Ys_clipped = jnp.minimum(Ys_scaled, clip)

    def norm(v):
        return (v - jnp.mean(v, axis=1, keepdims=True)) / (
            jnp.linalg.norm(v - jnp.mean(v, axis=1, keepdims=True),
                            axis=1, keepdims=True) + eps)

    corr = jnp.sum(norm(Xs) * norm(Ys_clipped), axis=1)  # (segments, bands)
    return jnp.mean(corr)


def stoi_loss(y_hat, y, lens=None, reduction="mean"):
    """Batched negative STOI (reference ``stoi_loss.py:14``) — −1 is perfect.

    Example
    -------
    >>> import numpy as np, jax.numpy as jnp
    >>> y = jnp.asarray(np.random.default_rng(0)
    ...                 .normal(size=(1, 10000)).astype(np.float32))
    >>> round(float(stoi_loss(y, y)), 4)    # identical signals: STOI = 1
    -1.0
    >>> noise = jnp.asarray(np.random.default_rng(1)
    ...                     .normal(size=(1, 10000)).astype(np.float32))
    >>> bool(stoi_loss(y + 2.0 * noise, y) > -0.6)   # heavy noise: far worse
    True
    """
    scores = []
    y_hat = jnp.asarray(y_hat)
    y = jnp.asarray(y)
    for i in range(y.shape[0]):
        t = y.shape[1]
        if lens is not None:
            t = int(round(float(np.asarray(lens)[i]) * y.shape[1]))
        scores.append(-stoi_measure(y[i, :t], y_hat[i, :t]))
    scores = jnp.stack(scores)
    if reduction == "mean":
        return jnp.mean(scores)
    return scores


def thirdoct(fs, nfft, num_bands, min_freq):
    """One-third octave band matrix + center frequencies
    (reference ``stoi_loss.py:14``); returns (obm (num_bands, nfft//2+1), cf)."""
    k = np.arange(num_bands)
    cf = 2.0 ** (k / 3.0) * min_freq
    obm = _thirdoct(fs=fs, nfft=nfft, num_bands=num_bands, min_freq=min_freq)
    return obm, cf


def removeSilentFrames(x, y, dyn_range=40, framelen=256, hop=128):
    """Drop frames of ``x`` more than ``dyn_range`` dB below its loudest
    frame, keeping ``y`` aligned (reference ``stoi_loss.py:36``)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    w = np.hanning(framelen + 2)[1:-1]
    n_frames = max((len(x) - framelen) // hop + 1, 0)
    if n_frames == 0:
        return x, y
    frames = np.stack([x[i * hop:i * hop + framelen] * w
                       for i in range(n_frames)])
    energies = 20 * np.log10(np.linalg.norm(frames, axis=1) / 16.0 + 1e-20)
    mask = (np.max(energies) - dyn_range - energies) < 0
    xs = np.zeros_like(x)
    ys = np.zeros_like(y)
    count = 0
    for i in range(n_frames):
        if mask[i]:
            lo = count * hop
            xs[lo:lo + framelen] += x[i * hop:i * hop + framelen] * w
            ys[lo:lo + framelen] += y[i * hop:i * hop + framelen] * w
            count += 1
    end = count * hop + framelen - hop
    return xs[:max(end, 0)], ys[:max(end, 0)]
