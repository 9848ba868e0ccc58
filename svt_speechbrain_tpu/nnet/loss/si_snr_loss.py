"""SI-SNR loss module (reference ``nnet/loss/si_snr_loss.py``)."""
from __future__ import annotations

import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.losses import cal_si_snr


def si_snr_loss(y_pred_batch, y_true_batch, lens=None, reduction="mean"):
    """Negative scale-invariant SNR; (B, T) predictions/targets.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> t = jnp.sin(jnp.arange(100.0))
    >>> # scaled copy: SI-SNR is scale-invariant, so loss is very negative
    >>> float(si_snr_loss(2.0 * t[None], t[None])) < -50
    True
    """
    est = y_pred_batch[..., None]
    src = y_true_batch[..., None]
    loss = -cal_si_snr(src, est)
    if reduction == "mean":
        return jnp.mean(loss)
    return loss
