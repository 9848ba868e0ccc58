"""Guided attention loss (analogue of reference
``speechbrain/nnet/loss/guidedattn_loss.py``): encourages near-diagonal
attention in seq2seq TTS/ASR (Tachibana et al.)."""
from __future__ import annotations

import jax.numpy as jnp


class GuidedAttentionLoss:
    """L = mean over valid (t, u) of A[t, u] * (1 - exp(-((u/U - t/T)^2) / 2σ²)).

    Call with attention (B, targets_len, inputs_len) and absolute lengths.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> loss = GuidedAttentionLoss(sigma=0.2)
    >>> lens = jnp.array([4])
    >>> diag = loss(jnp.eye(4)[None], lens, lens)        # on-diagonal: free
    >>> anti = loss(jnp.eye(4)[::-1][None], lens, lens)  # anti-diagonal
    >>> float(diag)
    0.0
    >>> bool(anti > diag)
    True
    """

    def __init__(self, sigma=0.2):
        self.sigma = sigma

    def guided_attentions(self, input_lengths, target_lengths, max_input_len,
                          max_target_len):
        ilens = jnp.asarray(input_lengths)[:, None, None]
        tlens = jnp.asarray(target_lengths)[:, None, None]
        t = jnp.arange(max_target_len)[None, :, None]
        u = jnp.arange(max_input_len)[None, None, :]
        w = 1.0 - jnp.exp(-((u / ilens - t / tlens) ** 2) / (2 * self.sigma ** 2))
        mask = (t < tlens) & (u < ilens)
        return jnp.where(mask, w, 0.0)

    def __call__(self, attention, input_lengths, target_lengths,
                 max_input_len=None, max_target_len=None):
        b, t_max, u_max = attention.shape
        weights = self.guided_attentions(input_lengths, target_lengths,
                                         max_input_len or u_max,
                                         max_target_len or t_max)
        losses = weights[:, :t_max, :u_max] * attention
        mask = weights[:, :t_max, :u_max] > 0
        denom = jnp.maximum(jnp.sum(
            ((jnp.arange(t_max)[None, :] < jnp.asarray(target_lengths)[:, None])[:, :, None]
             & (jnp.arange(u_max)[None, :] < jnp.asarray(input_lengths)[:, None])[:, None, :])
            .astype(jnp.float32)), 1.0)
        return jnp.sum(losses) / denom
