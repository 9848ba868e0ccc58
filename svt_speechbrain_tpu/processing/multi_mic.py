"""Multi-microphone processing: covariance, localization, beamforming
(analogue of reference ``speechbrain/processing/multi_mic.py``).

Tensors follow the reference STFT layout (batch, time, freq, 2, channels)
with real/imag stacked on axis 3; internally ops use complex jnp arrays
(``x = re + i·im``). All math is jit-able batched linear algebra — covariance
and beamforming weights are small per-frequency matrices the MXU handles as
batched matmuls.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module


def _to_complex(xs):
    return xs[..., 0, :] + 1j * xs[..., 1, :]  # (B, T, F, C)


def _from_complex(x):
    return jnp.stack([x.real, x.imag], axis=-2)


class Covariance(Module):
    """Spatial covariance matrices per (time-average, frequency)
    (reference ``multi_mic.py:85``). Returns the packed upper-triangular form
    like the reference when ``average=True``: here we return the full
    (B, T|1, F, C, C) complex covariance for downstream ops."""

    def __init__(self, average=True):
        self.average = average

    def __call__(self, params, xs):
        del params
        x = _to_complex(jnp.asarray(xs))  # (B, T, F, C)
        cov = jnp.einsum("btfc,btfd->btfcd", x, jnp.conj(x))
        if self.average:
            cov = jnp.mean(cov, axis=1, keepdims=True)
        return cov


class DelaySum(Module):
    """Delay-and-sum beamforming from TDOAs (reference ``multi_mic.py:198``)."""

    def __init__(self, sample_rate=16000, speed_sound=343.0, eps=1e-20):
        self.sample_rate = sample_rate
        self.eps = eps

    def __call__(self, params, xs, tdoas):
        """xs: (B, T, F, 2, C); tdoas: (B, C) delays in samples."""
        del params
        x = _to_complex(jnp.asarray(xs))
        b, t, f, c = x.shape
        n_fft = 2 * (f - 1)
        omega = 2 * np.pi * jnp.arange(f) / n_fft  # (F,)
        steering = jnp.exp(-1j * omega[None, :, None] * tdoas[:, None, :])  # (B,F,C)
        out = jnp.sum(x * jnp.conj(steering[:, None]), axis=-1, keepdims=True) / c
        return _from_complex(out)


class Mvdr(Module):
    """Minimum-variance distortionless-response beamforming
    (reference ``multi_mic.py:336``)."""

    def __init__(self, sample_rate=16000, speed_sound=343.0, eps=1e-10):
        self.eps = eps

    def __call__(self, params, xs, noise_cov, tdoas):
        """xs (B,T,F,2,C); noise_cov (B,1,F,C,C) complex; tdoas (B,C)."""
        del params
        x = _to_complex(jnp.asarray(xs))
        b, t, f, c = x.shape
        n_fft = 2 * (f - 1)
        omega = 2 * np.pi * jnp.arange(f) / n_fft
        d = jnp.exp(-1j * omega[None, :, None] * tdoas[:, None, :])  # (B,F,C)
        cov = noise_cov[:, 0] + self.eps * jnp.eye(c)[None, None]  # (B,F,C,C)
        cov_inv_d = jnp.linalg.solve(cov, d[..., None])  # (B,F,C,1)
        denom = jnp.einsum("bfc,bfcx->bfx", jnp.conj(d), cov_inv_d)  # (B,F,1)
        w = cov_inv_d[..., 0] / (denom + self.eps)  # (B,F,C)
        out = jnp.einsum("btfc,bfc->btf", x, jnp.conj(w))[..., None]
        return _from_complex(out)


class Gev(Module):
    """Generalized-eigenvalue beamforming (reference ``multi_mic.py:513``):
    w maximizes (wᴴ Φss w)/(wᴴ Φnn w) — principal generalized eigenvector."""

    def __init__(self, eps=1e-10):
        self.eps = eps

    def __call__(self, params, xs, speech_cov, noise_cov):
        del params
        x = _to_complex(jnp.asarray(xs))
        c = x.shape[-1]
        phi_ss = speech_cov[:, 0]
        phi_nn = noise_cov[:, 0] + self.eps * jnp.eye(c)[None, None]
        # solve Φnn⁻¹ Φss, take its principal eigenvector
        m = jnp.linalg.solve(phi_nn, phi_ss)
        eigvals, eigvecs = jnp.linalg.eig(m)
        idx = jnp.argmax(jnp.abs(eigvals), axis=-1)  # (B,F)
        w = jnp.take_along_axis(eigvecs, idx[..., None, None].repeat(c, -2),
                                axis=-1)[..., 0]  # (B,F,C)
        # BAN (blind analytic normalization) skipped (optional in reference)
        out = jnp.einsum("btfc,bfc->btf", x, jnp.conj(w))[..., None]
        return _from_complex(out)


class GccPhat(Module):
    """Generalized cross-correlation with phase transform → TDOAs
    (reference ``multi_mic.py:643``)."""

    def __init__(self, tdoa_max=None, eps=1e-20):
        self.tdoa_max = tdoa_max
        self.eps = eps

    def __call__(self, params, cov):
        """cov: (B, T|1, F, C, C) complex → TDOAs (B, C) relative to mic 0."""
        del params
        b = cov.shape[0]
        f = cov.shape[2]
        c = cov.shape[-1]
        n_fft = 2 * (f - 1)
        xcorr = cov[:, 0, :, :, 0]  # (B, F, C) cross-spectra vs mic 0
        phat = xcorr / (jnp.abs(xcorr) + self.eps)
        cc = jnp.fft.irfft(jnp.moveaxis(phat, 1, -1), n=n_fft, axis=-1)  # (B,C,n_fft)
        if self.tdoa_max is not None:
            tmax = int(self.tdoa_max)
            keep = jnp.concatenate([cc[..., :tmax], cc[..., -tmax:]], axis=-1)
            idx = jnp.argmax(keep, axis=-1)
            delays = jnp.where(idx < tmax, idx, idx - 2 * tmax)
        else:
            idx = jnp.argmax(cc, axis=-1)
            delays = jnp.where(idx <= n_fft // 2, idx, idx - n_fft)
        return delays.astype(jnp.float32)


class SrpPhat(Module):
    """Steered-response-power localization over candidate directions
    (reference ``multi_mic.py:838``)."""

    def __init__(self, mics, sample_rate=16000, speed_sound=343.0, n_dirs=200,
                 eps=1e-20):
        self.mics = np.asarray(mics)  # (C, 3)
        self.sample_rate = sample_rate
        self.speed_sound = speed_sound
        # uniform sphere sampling (fibonacci)
        i = np.arange(n_dirs)
        golden = (1 + 5 ** 0.5) / 2
        theta = 2 * np.pi * i / golden
        z = 1 - (2 * i + 1) / n_dirs
        r = np.sqrt(1 - z ** 2)
        self.dirs = np.stack([r * np.cos(theta), r * np.sin(theta), z], axis=-1)
        self.eps = eps

    def __call__(self, params, cov):
        """cov (B, 1, F, C, C) → unit direction-of-arrival (B, 3)."""
        del params
        f = cov.shape[2]
        n_fft = 2 * (f - 1)
        # candidate TDOAs per direction (D, C) in samples
        taus = (self.dirs @ self.mics.T) / self.speed_sound * self.sample_rate
        omega = 2 * np.pi * np.arange(f) / n_fft
        steering = np.exp(-1j * omega[None, :, None] * taus[:, None, :])  # (D,F,C)
        xcorr = cov[:, 0]  # (B,F,C,C)
        phat = xcorr / (jnp.abs(xcorr) + self.eps)
        # power(d) = Σ_f aᴴ Φ a
        power = jnp.real(jnp.einsum(
            "dfc,bfce,dfe->bd", jnp.conj(steering), phat, steering))
        best = jnp.argmax(power, axis=-1)
        return jnp.asarray(self.dirs)[best]


class Music(Module):
    """MUSIC localization via noise-subspace scan (reference ``multi_mic.py:1025``)."""

    def __init__(self, mics, sample_rate=16000, speed_sound=343.0, n_dirs=200,
                 n_sig=1, eps=1e-20):
        self.srp = SrpPhat(mics, sample_rate, speed_sound, n_dirs, eps)
        self.n_sig = n_sig
        self.eps = eps

    def __call__(self, params, cov):
        del params
        f = cov.shape[2]
        c = cov.shape[-1]
        n_fft = 2 * (f - 1)
        eigvals, eigvecs = jnp.linalg.eigh(cov[:, 0])  # ascending
        noise_sub = eigvecs[..., : c - self.n_sig]  # (B,F,C,C-n)
        taus = (self.srp.dirs @ self.srp.mics.T) / self.srp.speed_sound * self.srp.sample_rate
        omega = 2 * np.pi * np.arange(f) / n_fft
        steering = jnp.asarray(np.exp(-1j * omega[None, :, None] * taus[:, None, :]))
        proj = jnp.einsum("dfc,bfcn->bdfn", jnp.conj(steering), noise_sub)
        denom = jnp.sum(jnp.abs(proj) ** 2, axis=(-2, -1)) + self.eps
        spectrum = 1.0 / denom  # (B, D)
        best = jnp.argmax(spectrum, axis=-1)
        return jnp.asarray(self.srp.dirs)[best]


def doas2taus(doas, mics, fs, c=343.0):
    """Directions of arrival (unit xyz) → per-mic delays in samples
    (reference ``multi_mic.py:1292``): τ = (fs/c)·⟨doa, mic⟩."""
    return (fs / c) * jnp.matmul(jnp.asarray(doas), jnp.asarray(mics).T)


def tdoas2taus(tdoas):
    """Keep the per-channel delays from a GccPhat TDOA tensor of width
    M + M(M−1)/2 (reference ``multi_mic.py:1324``)."""
    n = tdoas.shape[-1]
    n_channels = int((-1 + (1 + 8 * n) ** 0.5) / 2)
    return tdoas[..., :n_channels]


def steering(taus, n_fft):
    """Delays (…, n_mics) → steering vectors (…, n_fft, 2, n_mics) with
    a = e^{−jωτ} (reference ``multi_mic.py:1336``)."""
    frame_size = int((n_fft - 1) * 2)
    omegas = 2 * jnp.pi * jnp.arange(n_fft) / frame_size      # (F,)
    phase = -omegas[None, :] * jnp.asarray(taus)[..., None]   # (..., M, F)
    a = jnp.stack([jnp.cos(phase), jnp.sin(phase)], axis=-1)  # (..., M, F, 2)
    return jnp.moveaxis(a, -3, -1)                            # (..., F, 2, M)


def sphere(levels_count=4):
    """Near-uniform unit-sphere directions from a subdivided icosahedron
    (reference ``multi_mic.py:1383``); duplicate midpoints are merged."""
    h = (5.0 ** 0.5) / 5.0
    r = (2.0 / 5.0) * (5.0 ** 0.5)
    pts = np.zeros((12, 3))
    pts[0] = [0, 0, 1]
    pts[11] = [0, 0, -1]
    ang = 2.0 * np.pi * np.arange(5) / 5.0
    pts[1:6, 0], pts[1:6, 1], pts[1:6, 2] = r * np.sin(ang), r * np.cos(ang), h
    pts[6:11, 0], pts[6:11, 1], pts[6:11, 2] = -r * np.sin(ang), -r * np.cos(ang), -h
    trs = np.array([
        [0, 2, 1], [0, 3, 2], [0, 4, 3], [0, 5, 4], [0, 1, 5],
        [9, 1, 2], [10, 2, 3], [6, 3, 4], [7, 4, 5], [8, 5, 1],
        [4, 7, 6], [5, 8, 7], [1, 9, 8], [2, 10, 9], [3, 6, 10],
        [11, 6, 7], [11, 7, 8], [11, 8, 9], [11, 9, 10], [11, 10, 6]])
    pts = [p for p in pts]
    for _ in range(levels_count):
        cache = {}

        def midpoint(i, j):
            key = (min(i, j), max(i, j))
            if key not in cache:
                m = pts[i] + pts[j]
                m = m / np.linalg.norm(m)
                cache[key] = len(pts)
                pts.append(m)
            return cache[key]

        new_trs = []
        for (a, b, c_) in trs:
            ab, bc, ca = midpoint(a, b), midpoint(b, c_), midpoint(c_, a)
            new_trs += [[a, ab, ca], [ab, b, bc], [ca, bc, c_], [ab, bc, ca]]
        trs = np.asarray(new_trs)
    return jnp.asarray(np.stack(pts))
