"""Transformer ASR / LM lobes (analogue of reference
``speechbrain/lobes/models/transformer/TransformerASR.py`` / ``TransformerLM.py``)."""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module, split_rngs
from svt_speechbrain_tpu.nnet.linear import Linear
from svt_speechbrain_tpu.nnet.embedding import Embedding
from svt_speechbrain_tpu.nnet.normalization import LayerNorm
from svt_speechbrain_tpu.models.transformer import (
    PositionalEncoding, TransformerEncoder, TransformerDecoder,
    get_lookahead_mask, get_key_padding_mask,
)
from svt_speechbrain_tpu.models.conformer import ConformerEncoder


class TransformerASR(Module):
    """CNN-less transformer ASR: input proj + encoder + decoder
    (reference ``TransformerASR.py:28``). ``encoder_module`` selects a
    vanilla transformer or conformer encoder.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> m = TransformerASR(tgt_vocab=11, input_size=20, d_model=16, nhead=4,
    ...                    num_encoder_layers=1, num_decoder_layers=1,
    ...                    d_ffn=32)
    >>> params = m.init(jax.random.PRNGKey(0))
    >>> enc, dec = m(params, jnp.ones((2, 7, 20)),
    ...              jnp.ones((2, 5), jnp.int32))
    >>> enc.shape, dec.shape
    ((2, 7, 16), (2, 5, 16))
    """

    def __init__(self, tgt_vocab, input_size, d_model=512, nhead=8,
                 num_encoder_layers=6, num_decoder_layers=6, d_ffn=2048,
                 dropout=0.1, activation="relu", normalize_before=False,
                 encoder_module="transformer", kernel_size=31,
                 max_length=2500):
        self.custom_src_module = Linear(d_model, input_size)
        self.custom_tgt_module = Embedding(tgt_vocab, d_model)
        self.positional_encoding = PositionalEncoding(d_model, max_length)
        if encoder_module == "conformer":
            self.encoder = ConformerEncoder(num_encoder_layers, d_model, d_ffn,
                                            nhead, kernel_size, dropout)
        else:
            self.encoder = TransformerEncoder(
                num_encoder_layers, nhead, d_ffn, d_model=d_model, dropout=dropout,
                activation=activation, normalize_before=normalize_before)
        self.decoder = TransformerDecoder(
            num_decoder_layers, nhead, d_ffn, d_model, dropout=dropout,
            activation=activation, normalize_before=normalize_before)
        self.encoder_module = encoder_module

    def init(self, rng):
        k1, k2, k3, k4 = split_rngs(rng, 4)
        return {"src": self.custom_src_module.init(k1),
                "tgt": self.custom_tgt_module.init(k2),
                "encoder": self.encoder.init(k3),
                "decoder": self.decoder.init(k4)}

    def encode(self, params, src, wav_len=None, rng=None, train=False):
        h = self.custom_src_module(params["src"], src)
        kpm = None
        if wav_len is not None:
            t = h.shape[1]
            n = jnp.round(jnp.asarray(wav_len) * t)
            kpm = jnp.arange(t)[None, :] >= n[:, None]
        if self.encoder_module == "conformer":
            return self.encoder(params["encoder"], h, src_key_padding_mask=kpm,
                                rng=rng, train=train), kpm
        h = h + self.positional_encoding(None, h)
        out, _ = self.encoder(params["encoder"], h, src_key_padding_mask=kpm,
                              rng=rng, train=train)
        return out, kpm

    def decode(self, params, tgt, encoder_out, enc_kpm=None, rng=None, train=False):
        e = self.custom_tgt_module(params["tgt"], tgt)
        e = e + self.positional_encoding(None, e)
        tgt_mask = get_lookahead_mask(tgt)
        out, _, _ = self.decoder(params["decoder"], e, encoder_out,
                                 tgt_mask=tgt_mask,
                                 memory_key_padding_mask=enc_kpm,
                                 rng=rng, train=train)
        return out

    def __call__(self, params, src, tgt, wav_len=None, pad_idx=0, rng=None,
                 train=False):
        rngs = split_rngs(rng, 2) if rng is not None else [None, None]
        encoder_out, kpm = self.encode(params, src, wav_len, rngs[0], train)
        dec_out = self.decode(params, tgt, encoder_out, kpm, rngs[1], train)
        return encoder_out, dec_out


class TransformerLM(Module):
    """Decoder-only transformer LM (reference ``TransformerLM.py:22``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> lm = TransformerLM(vocab=11, d_model=16, nhead=4,
    ...                    num_encoder_layers=1, d_ffn=32)
    >>> params = lm.init(jax.random.PRNGKey(0))
    >>> lm(params, jnp.ones((2, 5), jnp.int32)).shape   # per-token logits
    (2, 5, 11)
    """

    def __init__(self, vocab, d_model=512, nhead=8, num_encoder_layers=12,
                 d_ffn=2048, dropout=0.1, activation="relu",
                 normalize_before=False, max_length=2500):
        self.embedding = Embedding(vocab, d_model)
        self.positional_encoding = PositionalEncoding(d_model, max_length)
        self.encoder = TransformerEncoder(
            num_encoder_layers, nhead, d_ffn, d_model=d_model, dropout=dropout,
            activation=activation, normalize_before=normalize_before)
        self.out = Linear(vocab, d_model)
        self.d_model = d_model

    def init(self, rng):
        k1, k2, k3 = split_rngs(rng, 3)
        return {"embedding": self.embedding.init(k1),
                "encoder": self.encoder.init(k2),
                "out": self.out.init(k3)}

    def __call__(self, params, x, rng=None, train=False):
        e = self.embedding(params["embedding"], x) * np.sqrt(self.d_model)
        e = e + self.positional_encoding(None, e)
        mask = get_lookahead_mask(x)
        h, _ = self.encoder(params["encoder"], e, src_mask=mask, rng=rng, train=train)
        return self.out(params["out"], h)


class EncoderWrapper(Module):
    """Expose a TransformerASR's encode path as a standalone encoder module
    (reference ``TransformerASR.py:EncoderWrapper``) — what inference
    interfaces and CTC-only decoding plug into."""

    def __init__(self, transformer):
        self.transformer = transformer

    def init(self, rng):
        return self.transformer.init(rng)

    def __call__(self, params, x, wav_lens=None, **kwargs):
        out, _ = self.transformer.encode(params, x, wav_len=wav_lens)
        return out
