"""Guided attention loss — REFERENCE-EXACT
(``speechbrain/nnet/loss/guidedattn_loss.py``): penalizes attention mass
far from the diagonal (Tachibana et al., 2017) for roughly monotonic
seq2seq tasks (TTS, G2P).

Numerics mirrored from the reference: the soft mask is
``1 - exp(-((u/U_i - t/T_i)^2) / (2 sigma^2))`` zeroed outside each
utterance's valid rectangle, and the loss is the PLAIN mean of
``attention * mask`` over every element of the padded (batch, targets,
inputs) tensor — padding positions dilute the denominator exactly as the
reference's ``.mean()`` does (guidedattn_loss.py:113).
"""
from __future__ import annotations

import jax.numpy as jnp


class GuidedAttentionLoss:
    """Near-diagonal attention prior (reference ``guidedattn_loss.py:17``).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> loss = GuidedAttentionLoss(sigma=0.2)
    >>> input_lengths = jnp.array([2, 3])
    >>> target_lengths = jnp.array([3, 4])
    >>> alignments = jnp.asarray([
    ...     [[0.8, 0.2, 0.0], [0.4, 0.6, 0.0],
    ...      [0.2, 0.8, 0.0], [0.0, 0.0, 0.0]],
    ...     [[0.6, 0.2, 0.2], [0.1, 0.7, 0.2],
    ...      [0.3, 0.4, 0.3], [0.2, 0.3, 0.5]]])
    >>> round(float(loss(alignments, input_lengths, target_lengths)), 4)
    0.1142
    """

    def __init__(self, sigma=0.2):
        self.sigma = sigma
        self.weight_factor = 2 * (sigma ** 2)

    def guided_attentions(self, input_lengths, target_lengths,
                          max_input_len=None, max_target_len=None):
        """Soft masks of shape (batch, max_input_len, max_target_len)
        (reference ``:126``); zero outside each valid rectangle."""
        input_lengths = jnp.asarray(input_lengths)
        target_lengths = jnp.asarray(target_lengths)
        if max_input_len is None:
            max_input_len = int(input_lengths.max())
        if max_target_len is None:
            max_target_len = int(target_lengths.max())
        input_mesh = jnp.arange(max_input_len)[None, :, None]
        target_mesh = jnp.arange(max_target_len)[None, None, :]
        ilens = input_lengths[:, None, None]
        tlens = target_lengths[:, None, None]
        soft_mask = 1.0 - jnp.exp(
            -((input_mesh / ilens - target_mesh / tlens) ** 2)
            / self.weight_factor)
        outside = (input_mesh >= ilens) | (target_mesh >= tlens)
        return jnp.where(outside, 0.0, soft_mask)

    def __call__(self, attention, input_lengths, target_lengths,
                 max_input_len=None, max_target_len=None):
        """Loss for a padded (batch, targets, inputs) attention tensor —
        the unmasked global mean, as in the reference (``:113``)."""
        soft_mask = self.guided_attentions(
            input_lengths, target_lengths, max_input_len, max_target_len)
        return jnp.mean(attention * jnp.swapaxes(soft_mask, -1, -2))
