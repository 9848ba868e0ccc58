"""SI-SNR loss — REFERENCE-EXACT (``speechbrain/nnet/loss/si_snr_loss.py``).

Unlike the separation stack's ``cal_si_snr`` (which zero-means both
signals), this loss projects WITHOUT mean removal, truncates each
utterance by its relative length, and places ``np.finfo(float).eps``
exactly where the reference does (target energy, noise energy, and inside
the log). Golden-tested in ``tests/test_aux_losses_golden.py``.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

_SMALL = float(np.finfo("float").eps)


def si_snr_loss(y_pred_batch, y_true_batch, lens=None, reduction="mean"):
    """Negative scale-invariant SNR (reference ``si_snr_loss.py:17``).

    Arguments mirror the reference: (B, T) (or (B, T, 1)) degraded and
    clean batches, relative ``lens`` (ones when omitted), ``reduction``
    "mean" or "batch".

    Example
    -------
    >>> import jax.numpy as jnp
    >>> t = jnp.sin(jnp.arange(100.0))
    >>> # scaled copy: SI-SNR is scale-invariant, so loss is very negative
    >>> float(si_snr_loss(2.0 * t[None], t[None])) < -50
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

    scores = []
    for i in range(batch_size):
        t = int(lens[i] * y_pred_batch.shape[1])
        s_target = y_true_batch[i, :t]
        s_estimate = y_pred_batch[i, :t]

        dot = jnp.sum(s_estimate * s_target)
        s_target_energy = jnp.sum(s_target ** 2) + _SMALL
        proj = dot * s_target / s_target_energy
        e_noise = s_estimate - proj
        ratio = jnp.sum(proj ** 2) / (jnp.sum(e_noise ** 2) + _SMALL)
        scores.append(10 * jnp.log10(ratio + _SMALL))

    SI_SNR = jnp.stack(scores)
    if reduction == "mean":
        return -SI_SNR.mean()
    return -SI_SNR
