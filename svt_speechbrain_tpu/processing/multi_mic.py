"""Multi-microphone processing: covariance, TDOA localization, beamforming
(analogue of reference ``speechbrain/processing/multi_mic.py``).

Tensor contracts are the reference's, exactly:

- STFT inputs ``Xs``: ``(batch, time, n_fft/2+1, 2, n_mics)`` with real/imag
  stacked on axis 3.
- Covariance matrices: packed upper-triangular ``(batch, time, F, 2, P)``
  with ``P = M(M+1)/2`` entries ordered by ``triu_indices(M, M)``.
- TDOAs (``GccPhat`` output / beamformer localization input):
  ``(batch, time, P)`` FRACTIONAL delays in samples (argmax + quadratic
  interpolation), one per triu pair.
- Localization (``SrpPhat``/``Music``) outputs: per-frame unit directions
  ``(batch, time, 3)`` drawn from the subdivided-icosahedron ``sphere()``.

Internally everything runs on native complex jnp arrays — per-frequency
covariance/beamforming algebra is batched matmuls the MXU handles directly,
and ``jnp.fft.irfft`` replaces the reference's real/imag bookkeeping. The
reference's ``torch.unique``-over-time passes are a CPU micro-optimization
for time-averaged covariances, not semantics, so they are omitted: results
are identical because the math is applied per frame either way.

Reference: ``speechbrain/processing/multi_mic.py`` (Covariance:85,
DelaySum:198, Mvdr:336, Gev:513, GccPhat:643, SrpPhat:838, Music:1025,
doas2taus:1228, tdoas2taus:1272, steering:1317, sphere:1383).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module
from svt_speechbrain_tpu.processing import decomposition as eig


def _to_complex(xs):
    """(…, 2, M) stacked re/im → complex (…, M)."""
    xs = jnp.asarray(xs)
    return xs[..., 0, :] + 1j * xs[..., 1, :]


def _from_complex(x):
    """Complex (…, M) → (…, 2, M) stacked re/im."""
    return jnp.stack([jnp.real(x), jnp.imag(x)], axis=-2)


class Covariance(Module):
    """Per-frequency spatial covariance of a multi-channel STFT
    (reference ``multi_mic.py:85``): ``Xs (B, T, F, 2, M)`` →
    packed upper-triangular ``XXs (B, T, F, 2, P)`` with the pair order of
    ``triu_indices(M, M)``. With ``average=True`` the time axis carries the
    time-averaged covariance repeated at every frame.

    Example
    -------
    >>> import numpy as np
    >>> Xs = np.zeros((1, 4, 3, 2, 2), np.float32)
    >>> Xs[..., 0, 0] = 1.0   # mic 0 = 1+0j everywhere
    >>> Xs[..., 1, 1] = 1.0   # mic 1 = 0+1j everywhere
    >>> XXs = Covariance()(None, Xs)
    >>> XXs.shape              # P = 2*3/2 = 3 pairs
    (1, 4, 3, 2, 3)
    >>> np.asarray(XXs[0, 0, 0])   # (0,0)=1, (0,1)=conj(1)·j=+j, (1,1)=1
    array([[1., 0., 1.],
           [0., 1., 0.]], dtype=float32)
    """

    def __init__(self, average=True):
        self.average = average

    def __call__(self, params, xs):
        del params
        x = _to_complex(xs)  # (B, T, F, M)
        m = x.shape[-1]
        iu = np.triu_indices(m)
        # pair (i, j) holds E[conj(x_i)·x_j] — the reference's convention
        # (multi_mic.py:173-180: Rxx_im = Xre·Ximᵀ − Xim·Xreᵀ)
        cov = jnp.conj(x[..., iu[0]]) * x[..., iu[1]]  # (B, T, F, P)
        if self.average:
            n_frames = cov.shape[1]
            cov = jnp.mean(cov, axis=1, keepdims=True)
            cov = jnp.broadcast_to(cov, cov.shape[:1] + (n_frames,)
                                   + cov.shape[2:])
        return _from_complex(cov)


class DelaySum(Module):
    """Delay-and-sum beamforming (reference ``multi_mic.py:198``):
    steer to the TDOAs/DOAs and average the aligned channels,
    ``Ys = Σ_m conj(a_m)·X_m / M`` → ``(B, T, F, 2, 1)``."""

    def __call__(self, params, xs, localization_tensor, doa_mode=False,
                 mics=None, fs=None, c=343.0):
        """``xs (B, T, F, 2, M)``; ``localization_tensor`` is TDOAs
        ``(B, T, P)`` (or DOAs ``(B, T, 3)`` with ``doa_mode=True`` plus
        ``mics (M, 3)`` and ``fs``)."""
        del params
        n_fft = jnp.asarray(xs).shape[2]
        if doa_mode:
            taus = doas2taus(localization_tensor, mics=mics, fs=fs, c=c)
        else:
            taus = tdoas2taus(localization_tensor)
        a = _steering_complex(taus, n_fft)      # (B, T, F, M)
        x = _to_complex(xs)
        out = jnp.sum(jnp.conj(a) * x, axis=-1, keepdims=True) / x.shape[-1]
        return _from_complex(out)


class Mvdr(Module):
    """Minimum-variance distortionless-response beamforming
    (reference ``multi_mic.py:336``): ``w = N⁻¹a / Re(aᴴN⁻¹a)`` with the
    noise covariance regularized by ``decomposition.inv``'s built-in
    trace-scaled diagonal loading, then ``Ys = Σ conj(w)·X``."""

    def __init__(self, eps=1e-20):
        # kept for signature parity; the reference's forward never threads
        # its constructor eps into _mvdr (multi_mic.py:449), and neither
        # does ours: the division is guarded by inv()'s diagonal loading.
        self.eps = eps

    def __call__(self, params, xs, nns, localization_tensor, doa_mode=False,
                 mics=None, fs=None, c=343.0):
        """``xs (B, T, F, 2, M)``; ``nns`` packed noise covariance
        ``(B, T, F, 2, P)``; ``localization_tensor`` as in DelaySum."""
        del params
        n_fft = jnp.asarray(xs).shape[2]
        if doa_mode:
            taus = doas2taus(localization_tensor, mics=mics, fs=fs, c=c)
        else:
            taus = tdoas2taus(localization_tensor)
        a = _steering_complex(taus, n_fft)      # (B, T, F, M)
        nns_inv = eig.inv(nns)                  # (B, T, F, M, M, 2)
        n_inv = nns_inv[..., 0] + 1j * nns_inv[..., 1]
        n_inv_a = jnp.einsum("...ij,...j->...i", n_inv, a)
        alpha = 1.0 / jnp.real(jnp.einsum("...i,...i->...", jnp.conj(a),
                                          n_inv_a))
        w = n_inv_a * alpha[..., None]
        x = _to_complex(xs)
        out = jnp.sum(jnp.conj(w) * x, axis=-1, keepdims=True)
        return _from_complex(out)


class Gev(Module):
    """Generalized-eigenvalue beamforming (reference ``multi_mic.py:513``):
    w = principal generalized eigenvector of (Φss, pos_def(Φnn)), unit-
    normalized, applied UNconjugated (``Ys = Σ w·X`` — the reference's
    convention). The output inherits the eigensolver's per-frequency phase
    freedom; magnitudes are deterministic."""

    def __call__(self, params, xs, sss, nns):
        """``xs (B, T, F, 2, M)``; ``sss``/``nns`` packed covariances
        ``(B, T, F, 2, P)``."""
        del params
        m = jnp.asarray(xs).shape[-1]
        nns_pd = eig.pos_def(nns)
        vs, _ = eig.gevd(sss, nns_pd)           # (B, T, F, M, M, 2)
        w = vs[..., m - 1, 0] + 1j * vs[..., m - 1, 1]  # principal column
        w = w / jnp.sqrt(jnp.sum(jnp.abs(w) ** 2, axis=-1, keepdims=True))
        x = _to_complex(xs)
        out = jnp.sum(w * x, axis=-1, keepdims=True)
        return _from_complex(out)


class GccPhat(Module):
    """Generalized cross-correlation with phase transform
    (reference ``multi_mic.py:643``): packed covariances → fractional TDOAs
    ``(B, T, P)``, one per triu pair, from the argmax of the PHAT-weighted
    cross-correlation refined by quadratic interpolation.

    Example
    -------
    >>> import numpy as np
    >>> rng = np.random.default_rng(0)
    >>> x = rng.normal(size=(1, 64 + 8)).astype(np.float32)
    >>> sig = np.stack([x[:, 8:], x[:, :64]], axis=-1)  # mic1 lags by 8
    >>> spec = np.fft.rfft(sig, axis=1)                 # toy 1-frame "STFT"
    >>> Xs = np.stack([spec.real, spec.imag], 2)[:, None].astype(np.float32)
    >>> XXs = Covariance()(None, Xs)
    >>> tdoas = GccPhat()(None, XXs)
    >>> np.round(np.asarray(tdoas[0, 0]), 1)            # pairs (0,0),(0,1),(1,1)
    array([ 0.,  8., -0.], dtype=float32)
    """

    def __init__(self, tdoa_max=None, eps=1e-20):
        self.tdoa_max = tdoa_max
        self.eps = eps

    def __call__(self, params, xxs):
        del params
        xxs = jnp.asarray(xxs)
        n_fft = (xxs.shape[2] - 1) * 2
        cov = _to_complex(xxs)                              # (B, T, F, P)
        phat = cov / (jnp.abs(cov) + self.eps)
        # cross-correlation in the time domain, (B, T, n_fft, P)
        cc = jnp.fft.irfft(jnp.moveaxis(phat, 2, -1), n=n_fft, axis=-1)
        cc = jnp.moveaxis(cc, -1, 2)
        tdoa_max = n_fft // 2 if self.tdoa_max is None else int(self.tdoa_max)
        # search window: first tdoa_max lags (+) and last tdoa_max lags (−)
        sliced = jnp.concatenate([cc[..., :tdoa_max, :],
                                  cc[..., -tdoa_max:, :]], axis=2)
        idx = jnp.argmax(sliced, axis=2)                    # (B, T, P)
        offset = n_fft - sliced.shape[2]
        delays = jnp.where(idx >= tdoa_max, idx + offset - n_fft, idx)
        # quadratic interpolation around the peak (reference :805-838)
        def take(at):
            return jnp.take_along_axis(cc, ((at + n_fft) % n_fft)[..., None, :],
                                       axis=2)[..., 0, :]
        y1, y2, y3 = take(delays - 1), take(delays), take(delays + 1)
        return delays + (y1 - y3) / (2 * y1 - 4 * y2 + 2 * y3)


class SrpPhat(Module):
    """Steered-response-power localization with phase transform
    (reference ``multi_mic.py:838``): scan the ``sphere()`` grid of
    directions and return, per frame, the direction whose steered pairwise
    coherence is largest — ``(B, T, 3)``."""

    def __init__(self, mics, space="sphere", sample_rate=16000,
                 speed_sound=343.0, eps=1e-20):
        if space == "sphere":
            self.doas = sphere()
        elif space == "circle":
            raise NotImplementedError(
                "space='circle' is unimplemented in the reference too "
                "(multi_mic.py:920)")
        self.taus = doas2taus(self.doas, mics=mics, fs=sample_rate,
                              c=speed_sound)
        self.eps = eps

    def __call__(self, params, xxs):
        del params
        xxs = jnp.asarray(xxs)
        n_fft = xxs.shape[2]
        a = _steering_complex(self.taus, n_fft)     # (D, F, M)
        m = a.shape[-1]
        iu = np.triu_indices(m)
        # pairwise demixing weights conj(a_i)·a_j, flattened over (F, P)
        w = jnp.conj(a[..., iu[0]]) * a[..., iu[1]]            # (D, F, P)
        w = w.reshape(w.shape[0], -1)                          # (D, F*P)
        cov = _to_complex(xxs)                                 # (B, T, F, P)
        phat = cov / (jnp.abs(cov) + self.eps)
        phat = phat.reshape(phat.shape[:2] + (-1,))            # (B, T, F*P)
        # reference :1013 keeps Re(XX·W) (not conj(W)) — mirror exactly
        power = (phat.real @ w.real.T) - (phat.imag @ w.imag.T)  # (B, T, D)
        best = jnp.argmax(power, axis=-1)
        return jnp.asarray(self.doas)[best]


class Music(Module):
    """MUSIC localization (reference ``multi_mic.py:1025``): per frame,
    the direction whose steering vector is most orthogonal to the noise
    subspace — the ``n_mics − n_sig`` SMALLEST left-singular vectors of the
    covariance (``decomposition.svdl`` returns ascending order) —
    → ``(B, T, 3)``."""

    def __init__(self, mics, space="sphere", sample_rate=16000,
                 speed_sound=343.0, eps=1e-20, n_sig=1):
        if space == "sphere":
            self.doas = sphere()
        elif space == "circle":
            raise NotImplementedError(
                "space='circle' is unimplemented in the reference too "
                "(multi_mic.py:1121)")
        self.taus = doas2taus(self.doas, mics=mics, fs=sample_rate,
                              c=speed_sound)
        self.eps = eps
        self.n_sig = n_sig

    def __call__(self, params, xxs):
        del params
        xxs = jnp.asarray(xxs)
        n_fft = xxs.shape[2]
        a = _steering_complex(self.taus, n_fft)     # (D, F, M)
        m = a.shape[-1]
        us, _ = eig.svdl(xxs)                       # (B, T, F, M, M, 2)
        noise = us[..., : m - self.n_sig, 0] + 1j * us[..., : m - self.n_sig, 1]
        # |aᴴ·u_k| summed over the noise subspace (reference sums the
        # magnitudes, not their squares — multi_mic.py:1216)
        proj = jnp.einsum("dfm,btfmk->btdfk", jnp.conj(a), noise)
        denom = jnp.sum(jnp.abs(proj), axis=-1)                # (B, T, D, F)
        num = jnp.sum(jnp.abs(a) ** 2, axis=-1)                # (D, F)
        ps = num[None, None] / (denom + self.eps)
        spectrum = jnp.sum(ps, axis=-1) / n_fft                # (B, T, D)
        best = jnp.argmax(spectrum, axis=-1)
        return jnp.asarray(self.doas)[best]


def doas2taus(doas, mics, fs, c=343.0):
    """Directions of arrival (unit xyz, (…, 3)) → per-mic delays in samples
    (reference ``multi_mic.py:1228``): τ = (fs/c)·⟨doa, micᵀ⟩."""
    return (fs / c) * jnp.matmul(jnp.asarray(doas, jnp.float32),
                                 jnp.asarray(mics, jnp.float32).T)


def tdoas2taus(tdoas):
    """Keep each channel's delay vs mic 0 from a GccPhat TDOA tensor of
    packed width M + M(M−1)/2 — the first M triu entries are the (0, k)
    pairs (reference ``multi_mic.py:1272``)."""
    tdoas = jnp.asarray(tdoas)
    n = tdoas.shape[-1]
    n_channels = int(((1 + 8 * n) ** 0.5 - 1) / 2)
    return tdoas[..., :n_channels]


def _steering_complex(taus, n_fft):
    """Delays (…, M) → complex steering vectors (…, F, M), a = e^{−jωτ}."""
    frame_size = int((n_fft - 1) * 2)
    omegas = 2 * jnp.pi * jnp.arange(n_fft) / frame_size       # (F,)
    phase = -omegas[:, None] * jnp.asarray(taus)[..., None, :]  # (…, F, M)
    return jnp.cos(phase) + 1j * jnp.sin(phase)


def steering(taus, n_fft):
    """Delays (…, M) → steering vectors (…, F, 2, M) with a = e^{−jωτ}
    stacked re/im (reference ``multi_mic.py:1317``).

    Example
    -------
    >>> import numpy as np
    >>> taus = np.array([[0.0, 2.0]], np.float32)
    >>> As = steering(taus, n_fft=5)     # frame_size 8: ω_2·τ = π → a = −1
    >>> np.round(np.asarray(As[0, 2]), 5)
    array([[ 1., -1.],
           [ 0.,  0.]], dtype=float32)
    """
    return _from_complex(_steering_complex(taus, n_fft))


def sphere(levels_count=4):
    """Near-uniform unit directions from a subdivided icosahedron
    (reference ``multi_mic.py:1383``), replicating the reference's exact
    point ORDER: at each level every triangle splits in four, each new
    point is the normalized sum of a vertex pair, and the new point list is
    ordered by ascending pair key i·(K+1)+j (the reference's
    ``torch.unique`` of pair scalars). Level counts: 1 → 42, 2 → 162,
    3 → 642, 4 → 2562 points.

    Example
    -------
    >>> pts = sphere(levels_count=1)
    >>> pts.shape
    (42, 3)
    >>> float(jnp.max(jnp.abs(jnp.sum(pts ** 2, axis=1) - 1.0))) < 1e-5
    True
    """
    h = (5.0 ** 0.5) / 5.0
    r = (2.0 / 5.0) * (5.0 ** 0.5)
    pi = 3.141592654  # the reference's literal (multi_mic.py:1421)
    pts = np.zeros((12, 3), dtype=np.float32)
    pts[0] = [0, 0, 1]
    pts[11] = [0, 0, -1]
    ang = 2.0 * pi * np.arange(5, dtype=np.float32) / 5.0
    pts[1:6, 0], pts[1:6, 1], pts[1:6, 2] = (r * np.sin(ang),
                                             r * np.cos(ang), h)
    pts[6:11, 0], pts[6:11, 1], pts[6:11, 2] = (-r * np.sin(ang),
                                                -r * np.cos(ang), -h)
    trs = np.array([
        [0, 2, 1], [0, 3, 2], [0, 4, 3], [0, 5, 4], [0, 1, 5],
        [9, 1, 2], [10, 2, 3], [6, 3, 4], [7, 4, 5], [8, 5, 1],
        [4, 7, 6], [5, 8, 7], [1, 9, 8], [2, 10, 9], [3, 6, 10],
        [11, 6, 7], [11, 7, 8], [11, 8, 9], [11, 9, 10], [11, 10, 6]],
        dtype=np.int64)

    for _ in range(levels_count):
        t0, t1, t2 = trs[:, 0], trs[:, 1], trs[:, 2]
        # the 4 sub-triangles, each corner expressed as a vertex PAIR whose
        # normalized midpoint is the corner point ((i, i) = original vertex)
        corner1 = np.concatenate([np.stack([t0, t0], 1), np.stack([t0, t1], 1),
                                  np.stack([t2, t0], 1), np.stack([t0, t1], 1)])
        corner2 = np.concatenate([np.stack([t0, t1], 1), np.stack([t1, t1], 1),
                                  np.stack([t1, t2], 1), np.stack([t1, t2], 1)])
        corner3 = np.concatenate([np.stack([t2, t0], 1), np.stack([t1, t2], 1),
                                  np.stack([t2, t2], 1), np.stack([t2, t0], 1)])
        flat = np.sort(np.concatenate([corner1, corner2, corner3]), axis=1)
        key = flat[:, 0] * (flat.max() + 1) + flat[:, 1]
        uniq, inverse = np.unique(key, return_inverse=True)
        i = uniq // (flat.max() + 1)
        j = uniq - i * (flat.max() + 1)
        trs = inverse.reshape(3, -1).T
        pts = pts[i] + pts[j]
        pts /= np.sqrt(np.sum(pts ** 2, axis=1, keepdims=True))
    return jnp.asarray(pts)
