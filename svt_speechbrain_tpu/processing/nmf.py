"""Non-negative matrix factorization for source separation (analogue of
reference ``speechbrain/processing/NMF.py`` + ``decomposition.py``)."""
from __future__ import annotations

import numpy as np


def nmf_factorize(V, rank=20, n_iter=100, eps=1e-10, seed=0):
    """Multiplicative-update NMF: V ≈ W H with KL divergence
    (reference ``decomposition.py``).

    Example
    -------
    >>> import numpy as np
    >>> V = np.outer([1.0, 2.0, 3.0], [1.0, 0.5, 2.0, 1.0])  # rank-1 exactly
    >>> W, H = nmf_factorize(V, rank=1, n_iter=200)
    >>> bool(np.allclose(W @ H, V, atol=1e-6))
    True
    """
    rng = np.random.default_rng(seed)
    V = np.maximum(np.asarray(V, dtype=np.float64), eps)
    f, t = V.shape
    W = rng.random((f, rank)) + eps
    H = rng.random((rank, t)) + eps
    ones = np.ones_like(V)
    for _ in range(n_iter):
        WH = W @ H + eps
        H *= (W.T @ (V / WH)) / (W.T @ ones + eps)
        WH = W @ H + eps
        W *= ((V / WH) @ H.T) / (ones @ H.T + eps)
        W /= W.sum(axis=0, keepdims=True) + eps
    return W, H


def separate_sources(mixture_mag, W1, W2, n_iter=100, eps=1e-10, seed=0):
    """Wiener-style separation with two pre-trained spectral dictionaries
    (reference ``NMF.py`` separate).

    Example
    -------
    >>> import numpy as np
    >>> W1 = np.array([[1.0], [0.0]])   # source 1 lives in bin 0
    >>> W2 = np.array([[0.0], [1.0]])   # source 2 lives in bin 1
    >>> V = np.array([[2.0, 0.0],       # mixture magnitudes (F=2, T=2)
    ...               [0.0, 3.0]])
    >>> S1, S2 = separate_sources(V, W1, W2, n_iter=50)
    >>> np.round(S1, 2)
    array([[2., 0.],
           [0., 0.]])
    >>> np.round(S2, 2)
    array([[0., 0.],
           [0., 3.]])
    """
    rng = np.random.default_rng(seed)
    V = np.maximum(np.asarray(mixture_mag, dtype=np.float64), eps)
    W = np.concatenate([W1, W2], axis=1)
    k1 = W1.shape[1]
    H = rng.random((W.shape[1], V.shape[1])) + eps
    ones = np.ones_like(V)
    for _ in range(n_iter):
        WH = W @ H + eps
        H *= (W.T @ (V / WH)) / (W.T @ ones + eps)
    V1 = W[:, :k1] @ H[:k1]
    V2 = W[:, k1:] @ H[k1:]
    total = V1 + V2 + eps
    return V * V1 / total, V * V2 / total


def spectral_phase(stft, power=2, log=False):
    """Phase of a complex stft stack (reference ``NMF.py:14``)."""
    return np.arctan2(stft[..., 1], stft[..., 0])


def NMF_separate_spectra(Whats, Xmix):
    """Separate a mixture's magnitude spectra with two pre-trained NMF
    template dictionaries (reference ``NMF.py:38``); returns per-source
    magnitude estimates (X1hat, X2hat)."""
    W1, W2 = Whats
    return separate_sources(Xmix, W1, W2)


def reconstruct_results(X1hat, X2hat, X_stft, sample_rate, win_length,
                        hop_length):
    """Resynthesize separated sources with the mixture phase
    (reference ``NMF.py:120``): per-source soft mask on the magnitude, then
    inverse STFT. Returns (wavs1, wavs2) lists of numpy waveforms."""
    from svt_speechbrain_tpu.processing.features import ISTFT

    import jax.numpy as jnp

    X_stft = np.asarray(X_stft)
    phase = np.arctan2(X_stft[..., 1], X_stft[..., 0])
    mag = np.sqrt(X_stft[..., 0] ** 2 + X_stft[..., 1] ** 2)
    istft = ISTFT(sample_rate, win_length=win_length, hop_length=hop_length)
    out = []
    total = np.asarray(X1hat) + np.asarray(X2hat) + 1e-10
    for Xhat in (X1hat, X2hat):
        m = np.asarray(Xhat) / total
        est = m * mag
        comp = np.stack([est * np.cos(phase), est * np.sin(phase)], axis=-1)
        out.append(np.asarray(istft(None, jnp.asarray(comp))))
    return out[0], out[1]
