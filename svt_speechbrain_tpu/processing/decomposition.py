"""Generalized eigen/SVD helpers on the real/imag-stacked representation
(analogue of reference ``speechbrain/processing/decomposition.py``).

The reference packs complex Hermitian matrices as vectorized upper triangles
with interleaved real/imag parts and hand-rolls a generalized eigenvalue
solver for GEV beamforming. Here the public API is kept but the math runs on
native complex dtypes via ``numpy``/``jnp.linalg`` — the TPU-friendly form
(the heavy lifting happens in batched matmuls; eigen solves run at tiny
per-frequency sizes).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def f(ws):
    """Vectorized upper-triangle (…, C*(C+1), 2-interleaved) → full complex
    block-real matrix (…, 2C, 2C) (reference ``decomposition.py:f``)."""
    ws = jnp.asarray(ws)
    n = ws.shape[-1]
    c = int(round(((1 + 8 * (n // 2)) ** 0.5 - 1) / 2))
    m = _tri_to_complex(ws)
    re, im = jnp.real(m), jnp.imag(m)
    top = jnp.concatenate([re, -im], axis=-1)
    bot = jnp.concatenate([im, re], axis=-1)
    del c
    return jnp.concatenate([top, bot], axis=-2)


def finv(wsh):
    """Inverse of ``f``: block-real (…, 2C, 2C) → vectorized triangle."""
    wsh = jnp.asarray(wsh)
    c = wsh.shape[-1] // 2
    m = wsh[..., :c, :c] + 1j * wsh[..., c:, :c]
    return _complex_to_tri(m)


def g(ws):
    """Vectorized triangle → full complex matrix (…, C, C) as a stacked
    (…, C, C, 2) real/imag tensor (reference ``decomposition.py:g``)."""
    m = _tri_to_complex(jnp.asarray(ws))
    return jnp.stack([jnp.real(m), jnp.imag(m)], axis=-1)


def ginv(x):
    """Inverse of ``g``."""
    x = jnp.asarray(x)
    return _complex_to_tri(x[..., 0] + 1j * x[..., 1])


def _tri_to_complex(ws):
    n = ws.shape[-1] // 2
    c = int(round(((1 + 8 * n) ** 0.5 - 1) / 2))
    re = ws[..., 0::2]
    im = ws[..., 1::2]
    iu = np.triu_indices(c)
    m = jnp.zeros(ws.shape[:-1] + (c, c), jnp.complex64)
    m = m.at[..., iu[0], iu[1]].set(re + 1j * im)
    lower = jnp.conj(jnp.swapaxes(m, -1, -2))
    diag = m * jnp.eye(c)
    return m + lower - diag


def _complex_to_tri(m):
    c = m.shape[-1]
    iu = np.triu_indices(c)
    vals = m[..., iu[0], iu[1]]
    out = jnp.zeros(m.shape[:-2] + (c * (c + 1),), jnp.float32)
    out = out.at[..., 0::2].set(jnp.real(vals).astype(jnp.float32))
    out = out.at[..., 1::2].set(jnp.imag(vals).astype(jnp.float32))
    return out


def pos_def(ws, alpha=0.001, eps=1e-20):
    """Diagonal loading to force positive definiteness
    (reference ``decomposition.py:pos_def``)."""
    ws = jnp.asarray(ws)
    n = ws.shape[-1] // 2
    c = int(round(((1 + 8 * n) ** 0.5 - 1) / 2))
    iu = np.triu_indices(c)
    diag_positions = np.nonzero(iu[0] == iu[1])[0]
    re = ws[..., 0::2]
    load = alpha * jnp.mean(re[..., diag_positions], axis=-1,
                            keepdims=True) + eps
    re = re.at[..., diag_positions].add(load)
    out = ws.at[..., 0::2].set(re)
    return out


def inv(x):
    """Inverse of vectorized Hermitian matrices (reference
    ``decomposition.py:inv``): triangle in → triangle of the inverse out."""
    m = _tri_to_complex(pos_def(jnp.asarray(x)))
    return _complex_to_tri(jnp.linalg.inv(m))


def gevd(a, b=None):
    """Generalized eigendecomposition of Hermitian pairs in vectorized-
    triangle form (reference ``decomposition.py:gevd``): solves a·v = λ·b·v
    via Cholesky whitening; returns (eigenvectors (…, C, C, 2),
    eigenvalues ascending)."""
    am = np.asarray(_tri_to_complex(jnp.asarray(a)))
    if b is None:
        bm = np.broadcast_to(np.eye(am.shape[-1], dtype=am.dtype), am.shape)
    else:
        bm = np.asarray(_tri_to_complex(pos_def(jnp.asarray(b))))
    L = np.linalg.cholesky(bm)
    Linv = np.linalg.inv(L)
    white = Linv @ am @ np.conj(np.swapaxes(Linv, -1, -2))
    vals, vecs = np.linalg.eigh(white)
    full_vecs = np.conj(np.swapaxes(Linv, -1, -2)) @ vecs
    return (jnp.stack([jnp.asarray(full_vecs.real),
                       jnp.asarray(full_vecs.imag)], axis=-1),
            jnp.asarray(vals))


def svdl(a):
    """SVD of complex matrices in the (…, C, C, 2) stacked representation
    (reference ``decomposition.py:svdl``): returns (U, S, V) stacked."""
    a = np.asarray(a)
    m = a[..., 0] + 1j * a[..., 1]
    u, s, vh = np.linalg.svd(m)
    v = np.conj(np.swapaxes(vh, -1, -2))
    pack = lambda x: jnp.stack([jnp.asarray(x.real), jnp.asarray(x.imag)], -1)
    return pack(u), jnp.asarray(s), pack(v)
