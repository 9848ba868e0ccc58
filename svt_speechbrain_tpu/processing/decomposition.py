"""Generalized eigenvalue decomposition of complex Hermitian matrices
(analogue of reference ``speechbrain/processing/decomposition.py``).

The reference packs a complex Hermitian matrix as its upper-triangular part
in a ``(*, 2, C + P)`` tensor — axis -2 holds [real, imag] and the last axis
runs over ``triu_indices(C, C)`` — and does all linear algebra on a real
``(2C, 2C)`` block embedding. We keep the exact same public contract (packed
format in, ``(*, C, C, 2)`` stacked real/imag out, trace-scaled diagonal
loading) but run the math on native complex dtypes: a batched Cholesky
whitening + Hermitian eigensolve is what XLA lowers well on TPU, and the
real-block detour only exists upstream because old torch lacked complex
LAPACK. Eigenvalue ORDER matches the reference (ascending); eigenvectors
match up to the inherent per-column complex phase.

Reference: ``speechbrain/processing/decomposition.py`` (gevd:16, svdl:117,
f:182, finv:223, g:254, ginv:286, pos_def:315, inv:358).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _num_channels(p):
    """P = C(C+1)/2 packed length → C."""
    return int(round(((1 + 8 * p) ** 0.5 - 1) / 2))


def _unpack(ws):
    """Packed ``(*, 2, P)`` upper triangle → full complex Hermitian
    ``(*, C, C)``."""
    ws = jnp.asarray(ws)
    c = _num_channels(ws.shape[-1])
    iu = np.triu_indices(c)
    vals = ws[..., 0, :] + 1j * ws[..., 1, :]
    m = jnp.zeros(ws.shape[:-2] + (c, c), jnp.result_type(vals, jnp.complex64))
    m = m.at[..., iu[0], iu[1]].set(vals)
    lower = jnp.conj(jnp.swapaxes(m, -1, -2))
    return m + lower - m * jnp.eye(c)


def _pack(m):
    """Full complex Hermitian ``(*, C, C)`` → packed ``(*, 2, P)``."""
    c = m.shape[-1]
    iu = np.triu_indices(c)
    vals = m[..., iu[0], iu[1]]
    return jnp.stack([jnp.real(vals), jnp.imag(vals)], axis=-2)


def f(ws):
    """Packed upper triangle ``(*, 2, C+P)`` → interleaved real block matrix
    ``(*, 2C, 2C)`` where entry (i, j) expands to
    ``[[re, -im], [im, re]]`` at rows/cols (2i, 2i+1) × (2j, 2j+1)
    (reference ``decomposition.py:182``).

    Example
    -------
    >>> import numpy as np
    >>> ws = np.zeros((2, 3), np.float32)   # C=2: entries (0,0),(0,1),(1,1)
    >>> ws[0] = [1.0, 2.0, 3.0]
    >>> ws[1, 1] = 4.0                      # M[0,1] = 2+4j
    >>> f(ws)[0::2, 0::2]                   # real parts at even/even
    Array([[1., 2.],
           [2., 3.]], dtype=float32)
    >>> f(ws)[0, 3], f(ws)[1, 2]            # -im and +im of M[0,1]
    (Array(-4., dtype=float32), Array(4., dtype=float32))
    """
    m = _unpack(ws)
    c = m.shape[-1]
    out = jnp.zeros(m.shape[:-2] + (2 * c, 2 * c), jnp.float32)
    out = out.at[..., 0::2, 0::2].set(jnp.real(m))
    out = out.at[..., 1::2, 1::2].set(jnp.real(m))
    out = out.at[..., 0::2, 1::2].set(-jnp.imag(m))
    out = out.at[..., 1::2, 0::2].set(jnp.imag(m))
    return out


def finv(wsh):
    """Inverse of ``f``: interleaved block ``(*, 2C, 2C)`` → packed
    ``(*, 2, C+P)`` (reference ``decomposition.py:223``)."""
    wsh = jnp.asarray(wsh)
    c = wsh.shape[-1] // 2
    iu = np.triu_indices(c)
    re = wsh[..., 0::2, 0::2][..., iu[0], iu[1]]
    im = -wsh[..., 0::2, 1::2][..., iu[0], iu[1]]
    return jnp.stack([re, im], axis=-2)


def g(ws):
    """Full complex ``(*, C, C, 2)`` stacked re/im → interleaved real block
    ``(*, 2C, 2C)`` (reference ``decomposition.py:254``)."""
    ws = jnp.asarray(ws)
    c = ws.shape[-2]
    out = jnp.zeros(ws.shape[:-3] + (2 * c, 2 * c), ws.dtype)
    out = out.at[..., 0::2, 0::2].set(ws[..., 0])
    out = out.at[..., 1::2, 1::2].set(ws[..., 0])
    out = out.at[..., 0::2, 1::2].set(-ws[..., 1])
    out = out.at[..., 1::2, 0::2].set(ws[..., 1])
    return out


def ginv(wsh):
    """Inverse of ``g``: interleaved block ``(*, 2C, 2C)`` → stacked
    ``(*, C, C, 2)`` (reference ``decomposition.py:286``)."""
    wsh = jnp.asarray(wsh)
    return jnp.stack([wsh[..., 0::2, 0::2], wsh[..., 1::2, 0::2]], axis=-1)


def pos_def(ws, alpha=0.001, eps=1e-20):
    """Diagonal loading: add ``alpha * trace + eps`` to the real diagonal of
    a packed Hermitian matrix (reference ``decomposition.py:315`` — the
    loading is trace-proportional, NOT mean-proportional).

    Example
    -------
    >>> import numpy as np
    >>> ws = np.zeros((2, 3), np.float32)
    >>> ws[0] = [1.0, 0.0, 3.0]             # diag trace = 4
    >>> np.asarray(pos_def(ws, alpha=0.5))[0]
    array([3., 0., 5.], dtype=float32)
    """
    ws = jnp.asarray(ws)
    c = _num_channels(ws.shape[-1])
    iu = np.triu_indices(c)
    diag_positions = np.nonzero(iu[0] == iu[1])[0]
    re = ws[..., 0, :]
    trace = jnp.sum(re[..., diag_positions], axis=-1, keepdims=True)
    re = re.at[..., diag_positions].add(alpha * trace + eps)
    return ws.at[..., 0, :].set(re)


def inv(x):
    """Inverse of a packed complex Hermitian matrix, with the reference's
    built-in ``pos_def`` regularization applied first
    (reference ``decomposition.py:358``). Returns the full inverse as
    ``(*, C, C, 2)`` stacked real/imag."""
    m = _unpack(pos_def(jnp.asarray(x)))
    m_inv = jnp.linalg.inv(m)
    return jnp.stack([jnp.real(m_inv), jnp.imag(m_inv)], axis=-1)


def gevd(a, b=None):
    """Generalized eigendecomposition A·V = B·V·D of packed complex
    Hermitian pairs (reference ``decomposition.py:16``).

    Returns ``(vs, ds)`` both shaped ``(*, C, C, 2)``: ``vs`` columns are
    eigenvectors for ASCENDING eigenvalues; ``ds`` is the diagonal
    eigenvalue matrix. When ``b`` is None the identity is used. Solved by
    Cholesky whitening (b = L·Lᴴ, eigh on L⁻¹·a·L⁻ᴴ, v = L⁻ᴴ·y) — the same
    factorization the reference performs on its real block embedding, so
    eigenvalues agree exactly; eigenvectors agree up to the per-column
    complex phase any eigensolver is free to choose.

    Example
    -------
    >>> import numpy as np
    >>> a = np.array([[52, 34, 16, 125, 41, 62], [0, 37, 28, 0, 3, 0]],
    ...              np.float32)
    >>> vs, ds = gevd(a)
    >>> np.round(np.asarray(ds[..., 0]).diagonal(), 2)
    array([ 20.95,  43.94, 174.11], dtype=float32)
    """
    a = jnp.asarray(a)
    am = _unpack(a)
    if b is None:
        bm = jnp.broadcast_to(jnp.eye(am.shape[-1], dtype=am.dtype), am.shape)
    else:
        bm = _unpack(jnp.asarray(b))
    L = jnp.linalg.cholesky(bm)
    L_inv = jnp.linalg.inv(L)
    white = L_inv @ am @ jnp.conj(jnp.swapaxes(L_inv, -1, -2))
    vals, y = jnp.linalg.eigh(white)  # ascending
    vecs = jnp.conj(jnp.swapaxes(L_inv, -1, -2)) @ y
    c = am.shape[-1]
    ds = jnp.zeros(vals.shape[:-1] + (c, c, 2), jnp.float32)
    ds = ds.at[..., np.arange(c), np.arange(c), 0].set(vals.real)
    vs = jnp.stack([jnp.real(vecs), jnp.imag(vecs)], axis=-1)
    return vs, ds


def svdl(a):
    """Left singular vectors of a packed complex matrix via the
    eigendecomposition of A·Aᴴ (reference ``decomposition.py:117``).

    Returns ``(us, ds)`` both ``(*, C, C, 2)``, in the reference's
    ASCENDING eigenvalue order — column 0 is the SMALLEST singular
    direction (this ordering is what `multi_mic.Music` relies on to select
    its noise subspace). ``ds`` holds the singular values (sqrt of the
    eigenvalues of A·Aᴴ) on its real diagonal."""
    am = _unpack(jnp.asarray(a))
    h = am @ jnp.conj(jnp.swapaxes(am, -1, -2))
    vals, u = jnp.linalg.eigh(h)  # ascending
    c = am.shape[-1]
    ds = jnp.zeros(vals.shape[:-1] + (c, c, 2), jnp.float32)
    ds = ds.at[..., np.arange(c), np.arange(c), 0].set(
        jnp.sqrt(jnp.maximum(vals.real, 0.0)))
    us = jnp.stack([jnp.real(u), jnp.imag(u)], axis=-1)
    return us, ds
