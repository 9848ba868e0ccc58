"""SI-SNR loss module (reference ``nnet/loss/si_snr_loss.py``)."""
from __future__ import annotations

import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.losses import cal_si_snr


def si_snr_loss(y_pred_batch, y_true_batch, lens=None, reduction="mean"):
    """Negative scale-invariant SNR; (B, T) predictions/targets."""
    est = y_pred_batch[..., None]
    src = y_true_batch[..., None]
    loss = -cal_si_snr(src, est)
    if reduction == "mean":
        return jnp.mean(loss)
    return loss
