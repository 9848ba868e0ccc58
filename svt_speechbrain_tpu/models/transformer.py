"""Transformer lobes (analogue of reference
``speechbrain/lobes/models/transformer/Transformer.py``).

``PositionalEncoding`` is used by the RCA fusion block
(``N20EMv2/audio_visual/fusion.py:59-60``); the encoder/decoder stacks cover
the framework's general transformer capability (TransformerASR/LM etc. build
on these).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module, split_rngs
from svt_speechbrain_tpu.nnet.linear import Linear
from svt_speechbrain_tpu.nnet.normalization import LayerNorm
from svt_speechbrain_tpu.nnet.attention import MultiheadAttention, PositionalwiseFeedForward
from svt_speechbrain_tpu.nnet.dropout import dropout as _dropout


class PositionalEncoding(Module):
    """Sinusoidal absolute positional encoding (reference ``Transformer.py:178``).

    Called as ``pe = module(params, x)`` returning (1, T, d) to add to x.
    """

    def __init__(self, input_size, max_len=2500):
        self.input_size = input_size
        self.max_len = max_len
        pe = np.zeros((max_len, input_size), np.float32)
        positions = np.arange(max_len, dtype=np.float32)[:, None]
        denominator = np.exp(-np.arange(0, input_size, 2, dtype=np.float32)
                             * np.log(10000.0) / input_size)
        pe[:, 0::2] = np.sin(positions * denominator)
        pe[:, 1::2] = np.cos(positions * denominator)
        self.pe = jnp.asarray(pe[None])

    def __call__(self, params, x):
        del params
        return self.pe[:, :x.shape[1]].astype(x.dtype)


def get_lookahead_mask(padded_input):
    """Causal mask: True above the diagonal = masked
    (reference ``Transformer.py:765``)."""
    t = padded_input.shape[1]
    return jnp.triu(jnp.ones((t, t), bool), k=1)


def get_key_padding_mask(padded_input, pad_idx):
    """Key padding mask from a padded token tensor (reference
    ``Transformer.py:799``)."""
    if padded_input.ndim == 3:
        padded_input = padded_input[..., 0]
    return padded_input == pad_idx


class TransformerEncoderLayer(Module):
    """Post/pre-LN encoder layer (reference ``Transformer.py:225``)."""

    def __init__(self, d_ffn, nhead, d_model, kdim=None, vdim=None, dropout=0.0,
                 activation="relu", normalize_before=False):
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

    def __call__(self, params, src, src_mask=None, src_key_padding_mask=None,
                 pos_embs=None, rng=None, train=False):
        rngs = split_rngs(rng, 4) if rng is not None else [None] * 4
        if self.normalize_before:
            src1 = self.norm1(params["norm1"], src)
        else:
            src1 = src
        output, attn = self.self_att(params["self_att"], src1, src1, src1,
                                     attn_mask=src_mask,
                                     key_padding_mask=src_key_padding_mask,
                                     pos_embs=pos_embs, rng=rngs[0], train=train)
        src = src + _dropout(output, self.dropout, rngs[1], train)
        if not self.normalize_before:
            src = self.norm1(params["norm1"], src)

        src1 = self.norm2(params["norm2"], src) if self.normalize_before else src
        output = self.pos_ffn(params["pos_ffn"], src1, rng=rngs[2], train=train)
        output = src + _dropout(output, self.dropout, rngs[3], train)
        if not self.normalize_before:
            output = self.norm2(params["norm2"], output)
        return output, attn


class TransformerEncoder(Module):
    """Encoder stack (reference ``Transformer.py:318``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> enc = TransformerEncoder(num_layers=2, nhead=4, d_ffn=64, d_model=32)
    >>> params = enc.init(jax.random.PRNGKey(0))
    >>> out, attns = enc(params, jnp.ones((2, 10, 32)))
    >>> out.shape, len(attns), attns[0].shape
    ((2, 10, 32), 2, (2, 10, 10))
    """

    def __init__(self, num_layers, nhead, d_ffn, input_shape=None, d_model=None,
                 kdim=None, vdim=None, dropout=0.0, activation="relu",
                 normalize_before=False):
        if d_model is None and input_shape is not None:
            d_model = input_shape[-1]
        self.layers = [
            TransformerEncoderLayer(d_ffn, nhead, d_model, kdim, vdim, dropout,
                                    activation, normalize_before)
            for _ in range(num_layers)
        ]
        self.norm = LayerNorm(d_model, eps=1e-6)

    def init(self, rng):
        keys = split_rngs(rng, len(self.layers) + 1)
        return {"layers": {str(i): l.init(k) for i, (l, k) in enumerate(zip(self.layers, keys))},
                "norm": self.norm.init(keys[-1])}

    def __call__(self, params, src, src_mask=None, src_key_padding_mask=None,
                 pos_embs=None, rng=None, train=False):
        attns = []
        rngs = split_rngs(rng, len(self.layers)) if rng is not None else [None] * len(self.layers)
        for i, layer in enumerate(self.layers):
            src, attn = layer(params["layers"][str(i)], src, src_mask,
                              src_key_padding_mask, pos_embs, rngs[i], train)
            attns.append(attn)
        return self.norm(params["norm"], src), attns


class TransformerDecoderLayer(Module):
    """Decoder layer with self- and cross-attention (reference
    ``Transformer.py:525``)."""

    def __init__(self, d_ffn, nhead, d_model, kdim=None, vdim=None, dropout=0.0,
                 activation="relu", normalize_before=False):
        self.self_attn = MultiheadAttention(nhead, d_model, dropout=dropout)
        self.mutihead_attn = MultiheadAttention(nhead, d_model, dropout=dropout,
                                                kdim=kdim, vdim=vdim)
        self.pos_ffn = PositionalwiseFeedForward(d_ffn, d_model, dropout=dropout,
                                                 activation=activation)
        self.norm1 = LayerNorm(d_model, eps=1e-6)
        self.norm2 = LayerNorm(d_model, eps=1e-6)
        self.norm3 = LayerNorm(d_model, eps=1e-6)
        self.dropout = dropout
        self.normalize_before = normalize_before

    def init(self, rng):
        keys = split_rngs(rng, 6)
        return {"self_attn": self.self_attn.init(keys[0]),
                "mutihead_attn": self.mutihead_attn.init(keys[1]),
                "pos_ffn": self.pos_ffn.init(keys[2]),
                "norm1": self.norm1.init(keys[3]),
                "norm2": self.norm2.init(keys[4]),
                "norm3": self.norm3.init(keys[5])}

    def __call__(self, params, tgt, memory, tgt_mask=None, memory_mask=None,
                 tgt_key_padding_mask=None, memory_key_padding_mask=None,
                 rng=None, train=False):
        rngs = split_rngs(rng, 6) if rng is not None else [None] * 6
        tgt1 = self.norm1(params["norm1"], tgt) if self.normalize_before else tgt
        out, self_attn = self.self_attn(params["self_attn"], tgt1, tgt1, tgt1,
                                        attn_mask=tgt_mask,
                                        key_padding_mask=tgt_key_padding_mask,
                                        rng=rngs[0], train=train)
        tgt = tgt + _dropout(out, self.dropout, rngs[1], train)
        if not self.normalize_before:
            tgt = self.norm1(params["norm1"], tgt)

        tgt1 = self.norm2(params["norm2"], tgt) if self.normalize_before else tgt
        out, cross_attn = self.mutihead_attn(params["mutihead_attn"], tgt1, memory, memory,
                                             attn_mask=memory_mask,
                                             key_padding_mask=memory_key_padding_mask,
                                             rng=rngs[2], train=train)
        tgt = tgt + _dropout(out, self.dropout, rngs[3], train)
        if not self.normalize_before:
            tgt = self.norm2(params["norm2"], tgt)

        tgt1 = self.norm3(params["norm3"], tgt) if self.normalize_before else tgt
        out = self.pos_ffn(params["pos_ffn"], tgt1, rng=rngs[4], train=train)
        tgt = tgt + _dropout(out, self.dropout, rngs[5], train)
        if not self.normalize_before:
            tgt = self.norm3(params["norm3"], tgt)
        return tgt, self_attn, cross_attn


class TransformerDecoder(Module):
    """Decoder stack (reference ``Transformer.py:651``)."""

    def __init__(self, num_layers, nhead, d_ffn, d_model, kdim=None, vdim=None,
                 dropout=0.0, activation="relu", normalize_before=False):
        self.layers = [
            TransformerDecoderLayer(d_ffn, nhead, d_model, kdim, vdim, dropout,
                                    activation, normalize_before)
            for _ in range(num_layers)
        ]
        self.norm = LayerNorm(d_model, eps=1e-6)

    def init(self, rng):
        keys = split_rngs(rng, len(self.layers) + 1)
        return {"layers": {str(i): l.init(k) for i, (l, k) in enumerate(zip(self.layers, keys))},
                "norm": self.norm.init(keys[-1])}

    def __call__(self, params, tgt, memory, tgt_mask=None, memory_mask=None,
                 tgt_key_padding_mask=None, memory_key_padding_mask=None,
                 rng=None, train=False):
        self_attns, cross_attns = [], []
        rngs = split_rngs(rng, len(self.layers)) if rng is not None else [None] * len(self.layers)
        for i, layer in enumerate(self.layers):
            tgt, sa, ca = layer(params["layers"][str(i)], tgt, memory, tgt_mask,
                                memory_mask, tgt_key_padding_mask,
                                memory_key_padding_mask, rngs[i], train)
            self_attns.append(sa)
            cross_attns.append(ca)
        return self.norm(params["norm"], tgt), self_attns, cross_attns


class NormalizedEmbedding(Module):
    """Token embedding scaled by sqrt(d_model)
    (reference ``Transformer.py:178``)."""

    def __init__(self, d_model, vocab):
        from svt_speechbrain_tpu.nnet.embedding import Embedding

        self.d_model = d_model
        self.emb = Embedding(vocab, d_model)

    def init(self, rng):
        return self.emb.init(rng)

    def __call__(self, params, x):
        return self.emb(params, x) * jnp.sqrt(jnp.asarray(self.d_model,
                                                          jnp.float32))


class TransformerInterface(Module):
    """Encoder(+decoder) assembly base (reference ``Transformer.py:19``):
    picks transformer or conformer encoders by ``encoder_module`` and owns
    the positional encoding — the shared backbone under TransformerASR/SE/ST."""

    def __init__(self, d_model=512, nhead=8, num_encoder_layers=6,
                 num_decoder_layers=6, d_ffn=2048, dropout=0.1,
                 encoder_module="transformer", kernel_size=31,
                 attention_type="regularMHA", positional_encoding="fixed_abs_sine",
                 max_length=2500, causal=False):
        self.encoder_module = encoder_module
        self.positional_encoding = (PositionalEncoding(d_model, max_len=max_length)
                                    if positional_encoding else None)
        if encoder_module == "conformer":
            from svt_speechbrain_tpu.models.conformer import ConformerEncoder

            self.encoder = ConformerEncoder(
                num_encoder_layers, d_model=d_model, d_ffn=d_ffn, nhead=nhead,
                kernel_size=kernel_size, dropout=dropout, causal=causal)
        else:
            self.encoder = TransformerEncoder(num_encoder_layers, nhead, d_ffn,
                                              d_model=d_model, dropout=dropout)
        self.decoder = (TransformerDecoder(num_decoder_layers, nhead, d_ffn,
                                           d_model=d_model, dropout=dropout)
                        if num_decoder_layers > 0 else None)

    def init(self, rng):
        from svt_speechbrain_tpu.nnet.core import split_rngs

        k1, k2 = split_rngs(rng, 2)
        params = {"encoder": self.encoder.init(k1)}
        if self.decoder is not None:
            params["decoder"] = self.decoder.init(k2)
        return params
