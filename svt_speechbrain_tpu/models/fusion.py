"""Residual cross-attention (RCA) audio-visual fusion.

TPU-native rebuild of the reference's fusion block
(``N20EMv2/audio_visual/fusion.py``):

- ``RCALayer`` (``fusion.py:82-183``): ONE shared multi-head attention
  applied twice — self-attention on the kv-stream and cross-attention with
  the other stream's queries — combined residually as
  ``src_kv + α·self + (1-α)·cross`` (α = 0.5), then FFN + LayerNorm;
- ``RCANet`` (``fusion.py:9-79``): sinusoidal positional encodings on both
  streams, layer1 (kv=modality1, q=modality2), layer2 (kv=modality2,
  q=modality1);
- ``FusionRCA`` (``fusion.py:186-210``): frame-aligns audio (49.8 Hz) and
  video (50 Hz) features by truncation/zero-padding (warn if |diff| > 15),
  then sums the two fused streams.

On TPU the shared-weight self+cross attention is computed as one batched
attention with stacked queries [kv_stream; q_stream] against the same
keys/values — one MXU pass instead of two.
"""
from __future__ import annotations

import logging

import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module, split_rngs
from svt_speechbrain_tpu.nnet.attention import MultiheadAttention, PositionalwiseFeedForward
from svt_speechbrain_tpu.nnet.normalization import LayerNorm
from svt_speechbrain_tpu.nnet.dropout import dropout as _dropout
from svt_speechbrain_tpu.models.transformer import PositionalEncoding

logger = logging.getLogger(__name__)


class RCALayer(Module):
    """Shared-weight self+cross attention with α-residual (reference
    ``fusion.py:82-183``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> layer = RCALayer(d_ffn=32, nhead=4, d_model=16, alpha=0.5)
    >>> params = layer.init(jax.random.PRNGKey(0))
    >>> audio, video = jnp.ones((2, 10, 16)), jnp.ones((2, 10, 16))
    >>> layer(params, audio, video).shape       # audio attended by both
    (2, 10, 16)
    """

    def __init__(self, d_ffn, nhead, d_model, alpha=0.5, kdim=None, vdim=None,
                 dropout=0.0, activation="relu", normalize_before=False):
        self.alpha = alpha
        self.self_att = MultiheadAttention(nhead, d_model, dropout=dropout,
                                           kdim=kdim, vdim=vdim)
        self.pos_ffn = PositionalwiseFeedForward(d_ffn, d_model, dropout=dropout,
                                                 activation=activation)
        self.norm1 = LayerNorm(d_model, eps=1e-6)
        self.norm2 = LayerNorm(d_model, eps=1e-6)
        self.dropout = dropout
        self.normalize_before = normalize_before

    def init(self, rng):
        k1, k2, k3, k4 = split_rngs(rng, 4)
        return {"self_att": self.self_att.init(k1), "pos_ffn": self.pos_ffn.init(k2),
                "norm1": self.norm1.init(k3), "norm2": self.norm2.init(k4)}

    def __call__(self, params, src_kv, src_q, src_mask=None,
                 src_key_padding_mask=None, pos_embs=None, rng=None, train=False):
        rngs = split_rngs(rng, 4) if rng is not None else [None] * 4
        if self.normalize_before:
            src = self.norm1(params["norm1"], src_kv)
            src_q = self.norm1(params["norm1"], src_q)
        else:
            src = src_kv

        # one batched attention for both query sets against the same kv —
        # the reference runs the same MHA twice (fusion.py:151-168)
        t = src.shape[1]
        queries = jnp.concatenate([src, src_q], axis=1)
        out, _ = self.self_att(params["self_att"], queries, src, src,
                               attn_mask=src_mask,
                               key_padding_mask=src_key_padding_mask,
                               pos_embs=pos_embs, rng=rngs[0], train=train)
        self_out, cross_out = out[:, :t], out[:, t:]

        src = (src_kv
               + _dropout(self_out, self.dropout, rngs[1], train) * self.alpha
               + _dropout(cross_out, self.dropout, rngs[1], train) * (1 - self.alpha))
        if not self.normalize_before:
            src = self.norm1(params["norm1"], src)

        if self.normalize_before:
            src = self.norm2(params["norm2"], src)
        output = self.pos_ffn(params["pos_ffn"], src, rng=rngs[2], train=train)
        output = src + _dropout(output, self.dropout, rngs[3], train)
        if not self.normalize_before:
            output = self.norm2(params["norm2"], output)
        return output


class RCANet(Module):
    """Two RCA layers over two modality streams (reference ``fusion.py:9-79``)."""

    def __init__(self, nhead, d_ffn, alpha=0.5, d_model=None, kdim=None, vdim=None,
                 dropout=0.0, activation="relu", normalize_before=False,
                 max_length=2500):
        self.positional_encoding = PositionalEncoding(d_model, max_length)
        self.layer1 = RCALayer(d_ffn, nhead, d_model, alpha, kdim, vdim, dropout,
                               activation, normalize_before)
        self.layer2 = RCALayer(d_ffn, nhead, d_model, alpha, kdim, vdim, dropout,
                               activation, normalize_before)

    def init(self, rng):
        k1, k2 = split_rngs(rng, 2)
        return {"layer1": self.layer1.init(k1), "layer2": self.layer2.init(k2)}

    def __call__(self, params, src1, src2, src_mask=None,
                 src_key_padding_mask=None, pos_embs=None, rng=None, train=False):
        src1 = src1 + self.positional_encoding(None, src1)
        src2 = src2 + self.positional_encoding(None, src2)
        rngs = split_rngs(rng, 2) if rng is not None else [None, None]
        output1 = self.layer1(params["layer1"], src_kv=src1, src_q=src2,
                              src_mask=src_mask,
                              src_key_padding_mask=src_key_padding_mask,
                              pos_embs=pos_embs, rng=rngs[0], train=train)
        output2 = self.layer2(params["layer2"], src_kv=src2, src_q=src1,
                              src_mask=src_mask,
                              src_key_padding_mask=src_key_padding_mask,
                              pos_embs=pos_embs, rng=rngs[1], train=train)
        return output1, output2


class FusionRCA(Module):
    """Frame-align then fuse audio/video feature streams (reference
    ``fusion.py:186-210``)."""

    def __init__(self, alpha=0.5, nhead=8, d_ffn=3072, d_model=1024):
        self.fusion = RCANet(alpha=alpha, nhead=nhead, d_ffn=d_ffn, d_model=d_model)

    def init(self, rng):
        return {"fusion": self.fusion.init(rng)}

    def __call__(self, params, audio_feats, video_feats, rng=None, train=False):
        # frame alignment: truncate or zero-pad video to the audio frame count
        audio_frames = audio_feats.shape[1]
        video_frames = video_feats.shape[1]
        diff = audio_frames - video_frames
        if diff < 0:
            video_feats = video_feats[:, :diff]
        elif diff > 0:
            pad = jnp.zeros((video_feats.shape[0], diff, video_feats.shape[2]),
                            video_feats.dtype)
            video_feats = jnp.concatenate([video_feats, pad], axis=1)
        if abs(diff) > 15:
            logger.warning("Alignment is wrong")

        audio_out, video_out = self.fusion(params["fusion"], audio_feats,
                                           video_feats, rng=rng, train=train)
        return audio_out + video_out
