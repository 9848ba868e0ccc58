"""fairseq-style seq2seq transformer decoder for AV-HuBERT ASR checkpoints.

The reference vendors fairseq's incremental ``TransformerDecoder``
(``speechbrain/lobes/models/decoder.py:38``) so ``hubert_asr`` seq2seq
checkpoints can beam-decode through the vendored ``SequenceGenerator``
(``speechbrain/lobes/models/sequence_generator.py:20``). This module is the
TPU-native counterpart: the same decoder math (fairseq sinusoidal positions
offset by the padding index, sqrt(d)-scaled embeddings, pre-/post-norm
residual blocks over self-attention, encoder cross-attention and the FFN,
shared or separate output embedding) as a pure-function Module, with

- a **teacher-forced forward** (one fused causal program — the training /
  scoring path), and
- an **incremental step** over a preallocated static-shape KV cache (the
  serving path: one jitted program reused for every step and beam width,
  cross-attention keys/values computed once per utterance).

Golden-tested against the vendored reference decoder in
``tests/test_seq2seq_decode_golden.py``; driven by
``decoders.fairseq_generator.FairseqSequenceGenerator``.
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import (Module, glorot_uniform,
                                            normal_init, split_rngs)
from svt_speechbrain_tpu.nnet.attention import MultiheadAttention
from svt_speechbrain_tpu.nnet.normalization import LayerNorm


@dataclass
class FairseqDecoderConfig:
    """Hyperparameters mirroring the reference cfg fields
    (``decoder.py:60-121``): ``decoder_embed_dim``, ``decoder_ffn_embed_dim``,
    ``decoder_layers``, ``decoder_attention_heads``,
    ``decoder_normalize_before``, ``share_decoder_input_output_embed``,
    ``no_scale_embedding``, ``decoder_learned_pos``,
    ``max_target_positions``, ``activation_fn``."""

    vocab_size: int
    embed_dim: int = 768
    ffn_dim: int = 3072
    num_layers: int = 6
    num_heads: int = 4
    normalize_before: bool = True
    share_input_output_embed: bool = False
    no_scale_embedding: bool = False
    learned_pos: bool = False
    max_target_positions: int = 2048
    padding_idx: int = 1
    activation: str = "relu"
    dropout: float = 0.0


def sinusoidal_positions(num_embeddings, dim, padding_idx):
    """fairseq ``SinusoidalPositionalEmbedding.get_embedding``: half sines,
    half cosines **concatenated** (not interleaved), odd dims zero-padded,
    the padding row zeroed.

    Example
    -------
    >>> import numpy as np
    >>> t = sinusoidal_positions(6, 4, padding_idx=1)
    >>> t.shape
    (6, 4)
    >>> bool(abs(t[1]).max() == 0.0)   # padding row zeroed
    True
    """
    half = dim // 2
    freq = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                   * -(math.log(10000.0) / (half - 1)))
    ang = jnp.arange(num_embeddings, dtype=jnp.float32)[:, None] * freq[None]
    table = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=1)
    if dim % 2 == 1:
        table = jnp.concatenate(
            [table, jnp.zeros((num_embeddings, 1), jnp.float32)], axis=1)
    if padding_idx is not None:
        table = table.at[padding_idx].set(0.0)
    return table


class _DecoderLayer(Module):
    """One fairseq decoder layer: self-attn → cross-attn → FFN residual
    blocks, pre- or post-norm (``fairseq.modules.TransformerDecoderLayer``
    as driven by reference ``decoder.py:190-201``)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.self_attn = MultiheadAttention(cfg.num_heads, cfg.embed_dim)
        self.encoder_attn = MultiheadAttention(cfg.num_heads, cfg.embed_dim)
        self.ln_self = LayerNorm(cfg.embed_dim)
        self.ln_cross = LayerNorm(cfg.embed_dim)
        self.ln_final = LayerNorm(cfg.embed_dim)

    def init(self, rng):
        ks = split_rngs(rng, 4)
        d, f = self.cfg.embed_dim, self.cfg.ffn_dim
        return {
            "self_attn": self.self_attn.init(ks[0]),
            "encoder_attn": self.encoder_attn.init(ks[1]),
            "ln_self": self.ln_self.init(None),
            "ln_cross": self.ln_cross.init(None),
            "ln_final": self.ln_final.init(None),
            "fc1": {"w": glorot_uniform(ks[2], (d, f)),
                    "b": jnp.zeros((f,), jnp.float32)},
            "fc2": {"w": glorot_uniform(ks[3], (f, d)),
                    "b": jnp.zeros((d,), jnp.float32)},
        }

    def _ffn(self, params, x):
        h = jnp.matmul(x, params["fc1"]["w"].astype(x.dtype)) + \
            params["fc1"]["b"].astype(x.dtype)
        h = (jnp.maximum(h, 0) if self.cfg.activation == "relu"
             else jax.nn.gelu(h, approximate=False))
        return jnp.matmul(h, params["fc2"]["w"].astype(h.dtype)) + \
            params["fc2"]["b"].astype(h.dtype)

    def __call__(self, params, x, encoder_out, self_mask=None,
                 encoder_padding_mask=None):
        pre = self.cfg.normalize_before
        h = self.ln_self(params["ln_self"], x) if pre else x
        h, _ = self.self_attn(params["self_attn"], h, h, h,
                              attn_mask=self_mask, return_attn_weights=True)
        x = x + h
        if not pre:
            x = self.ln_self(params["ln_self"], x)

        h = self.ln_cross(params["ln_cross"], x) if pre else x
        h, attn = self.encoder_attn(params["encoder_attn"], h, encoder_out,
                                    encoder_out,
                                    key_padding_mask=encoder_padding_mask,
                                    return_attn_weights=True)
        x = x + h
        if not pre:
            x = self.ln_cross(params["ln_cross"], x)

        h = self.ln_final(params["ln_final"], x) if pre else x
        x = x + self._ffn(params, h)
        if not pre:
            x = self.ln_final(params["ln_final"], x)
        return x, attn


class FairseqTransformerDecoder(Module):
    """The full decoder: embeddings + positions + layer stack + output
    projection (reference ``decoder.py:123-220``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> cfg = FairseqDecoderConfig(vocab_size=11, embed_dim=8, ffn_dim=16,
    ...                            num_layers=2, num_heads=2)
    >>> dec = FairseqTransformerDecoder(cfg)
    >>> params = dec.init(jax.random.PRNGKey(0))
    >>> enc = jnp.ones((2, 5, 8))
    >>> logits, attn = dec(params, jnp.asarray([[2, 4, 6], [2, 5, 1]]), enc)
    >>> logits.shape
    (2, 3, 11)
    >>> cache = dec.init_cache(params, enc, max_len=4)
    >>> step0, cache = dec.step(params, cache, jnp.asarray([2, 2]), 0)
    >>> bool(jnp.allclose(step0, logits[:, 0], atol=1e-5))
    True
    """

    def __init__(self, cfg):
        self.cfg = cfg
        self.layers = [_DecoderLayer(cfg) for _ in range(cfg.num_layers)]
        self.final_ln = LayerNorm(cfg.embed_dim) if cfg.normalize_before \
            else None
        self.embed_scale = (1.0 if cfg.no_scale_embedding
                            else math.sqrt(cfg.embed_dim))
        # fairseq table size: positions start at padding_idx + 1
        self._n_pos = cfg.max_target_positions + cfg.padding_idx + 1

    def init(self, rng):
        ks = split_rngs(rng, len(self.layers) + 3)
        cfg = self.cfg
        params = {
            "embed_tokens": {"table": normal_init(
                ks[0], (cfg.vocab_size, cfg.embed_dim),
                stddev=cfg.embed_dim ** -0.5)},
            "layers": {str(i): l.init(k)
                       for i, (l, k) in enumerate(zip(self.layers, ks[1:]))},
        }
        if cfg.learned_pos:
            params["embed_positions"] = {"table": normal_init(
                ks[-2], (self._n_pos, cfg.embed_dim),
                stddev=cfg.embed_dim ** -0.5)}
        if not cfg.share_input_output_embed:
            params["embed_out"] = normal_init(
                ks[-1], (cfg.vocab_size, cfg.embed_dim),
                stddev=cfg.embed_dim ** -0.5)
        if self.final_ln is not None:
            params["final_ln"] = self.final_ln.init(None)
        return params

    # ------------------------------------------------------------ helpers

    def _pos_table(self, params, length):
        if self.cfg.learned_pos:
            return params["embed_positions"]["table"]
        n = max(self._n_pos, length + self.cfg.padding_idx + 1)
        return sinusoidal_positions(n, self.cfg.embed_dim,
                                    self.cfg.padding_idx)

    def _embed(self, params, tokens, positions):
        x = params["embed_tokens"]["table"][tokens] * self.embed_scale
        return x + self._pos_table(params, int(tokens.shape[-1]))[positions]

    def _output(self, params, x):
        table = (params["embed_tokens"]["table"]
                 if self.cfg.share_input_output_embed
                 else params["embed_out"])
        return jnp.matmul(x, table.astype(x.dtype).T)

    # ------------------------------------------------------- full forward

    def __call__(self, params, prev_tokens, encoder_out,
                 encoder_padding_mask=None):
        """Teacher-forced forward: ``prev_tokens`` (B, T) int →
        (logits (B, T, V), last layer's head-averaged cross-attention)."""
        pad = self.cfg.padding_idx
        nonpad = (prev_tokens != pad).astype(jnp.int32)
        positions = jnp.cumsum(nonpad, axis=1) * nonpad + pad
        x = self._embed(params, prev_tokens, positions)
        t = prev_tokens.shape[1]
        causal = jnp.triu(jnp.ones((t, t), bool), k=1)
        attn = None
        for i, layer in enumerate(self.layers):
            x, attn = layer(params["layers"][str(i)], x, encoder_out,
                            self_mask=causal,
                            encoder_padding_mask=encoder_padding_mask)
        if self.final_ln is not None:
            x = self.final_ln(params["final_ln"], x)
        return self._output(params, x), attn

    # -------------------------------------------------- incremental decode

    def init_cache(self, params, encoder_out, max_len,
                   encoder_padding_mask=None):
        """Static-shape decode state: per-layer self-attn K/V rings of
        length ``max_len`` plus cross-attn K/V computed ONCE from the
        encoder output (they never change across steps)."""
        b = encoder_out.shape[0]
        d = self.cfg.embed_dim
        cache = {"enc_mask": encoder_padding_mask, "layers": {}}
        for i in range(self.cfg.num_layers):
            lp = params["layers"][str(i)]["encoder_attn"]
            ek = jnp.matmul(encoder_out, lp["wk"].astype(encoder_out.dtype)) \
                + lp["bk"].astype(encoder_out.dtype)
            ev = jnp.matmul(encoder_out, lp["wv"].astype(encoder_out.dtype)) \
                + lp["bv"].astype(encoder_out.dtype)
            cache["layers"][str(i)] = {
                "k_self": jnp.zeros((b, max_len, d), encoder_out.dtype),
                "v_self": jnp.zeros((b, max_len, d), encoder_out.dtype),
                "k_cross": ek, "v_cross": ev,
            }
        return cache

    def reorder_cache(self, cache, order):
        """Beam reorder: gather every cached tensor along the batch axis."""
        return jax.tree_util.tree_map(
            lambda a: None if a is None else jnp.take(a, order, axis=0),
            cache, is_leaf=lambda a: a is None)

    def _attend(self, q, k, v, h, mask=None):
        b = q.shape[0]
        dh = self.cfg.embed_dim // h
        qh = q.reshape(b, h, dh)
        kh = k.reshape(b, -1, h, dh).transpose(0, 2, 1, 3)
        vh = v.reshape(b, -1, h, dh).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhd,bhtd->bht", qh, kh) / math.sqrt(dh)
        if mask is not None:
            scores = jnp.where(mask[:, None, :], -jnp.inf, scores)
        w = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bht,bhtd->bhd", w, vh).reshape(b, -1)

    def step(self, params, cache, tokens_t, t):
        """One decode step: ``tokens_t`` (B,) int32 previous tokens at
        position ``t`` (0-based) → (log-potential logits (B, V), cache).
        ``t`` may be a traced scalar — the program is step-invariant."""
        cfg = self.cfg
        pos = cfg.padding_idx + 1 + t
        table = self._pos_table(params, int(cfg.max_target_positions))
        x = params["embed_tokens"]["table"][tokens_t] * self.embed_scale \
            + table[pos]
        max_len = next(iter(cache["layers"].values()))["k_self"].shape[1]
        future = jnp.arange(max_len) > t  # (L,) True = not yet written
        for i, layer in enumerate(self.layers):
            lp = params["layers"][str(i)]
            lc = cache["layers"][str(i)]
            pre = cfg.normalize_before
            ln = self.layers[i].ln_self  # all three norms share the module
            h = ln(lp["ln_self"], x) if pre else x
            ap = lp["self_attn"]
            q = jnp.matmul(h, ap["wq"].astype(h.dtype)) + \
                ap["bq"].astype(h.dtype)
            k_t = jnp.matmul(h, ap["wk"].astype(h.dtype)) + \
                ap["bk"].astype(h.dtype)
            v_t = jnp.matmul(h, ap["wv"].astype(h.dtype)) + \
                ap["bv"].astype(h.dtype)
            lc["k_self"] = jax.lax.dynamic_update_slice(
                lc["k_self"], k_t[:, None].astype(lc["k_self"].dtype),
                (0, t, 0))
            lc["v_self"] = jax.lax.dynamic_update_slice(
                lc["v_self"], v_t[:, None].astype(lc["v_self"].dtype),
                (0, t, 0))
            o = self._attend(q, lc["k_self"], lc["v_self"], cfg.num_heads,
                             mask=jnp.broadcast_to(future,
                                                   (q.shape[0], max_len)))
            o = jnp.matmul(o, ap["wo"].astype(o.dtype)) + \
                ap["bo"].astype(o.dtype)
            x = x + o
            if not pre:
                x = ln(lp["ln_self"], x)

            h = ln(lp["ln_cross"], x) if pre else x
            cp = lp["encoder_attn"]
            q = jnp.matmul(h, cp["wq"].astype(h.dtype)) + \
                cp["bq"].astype(h.dtype)
            enc_mask = cache["enc_mask"]
            o = self._attend(q, lc["k_cross"], lc["v_cross"], cfg.num_heads,
                             mask=enc_mask)
            o = jnp.matmul(o, cp["wo"].astype(o.dtype)) + \
                cp["bo"].astype(o.dtype)
            x = x + o
            if not pre:
                x = ln(lp["ln_cross"], x)

            h = ln(lp["ln_final"], x) if pre else x
            layer_obj = self.layers[i]
            x = x + layer_obj._ffn(lp, h)
            if not pre:
                x = ln(lp["ln_final"], x)

        if self.final_ln is not None:
            x = self.final_ln(params["final_ln"], x)
        return self._output(params, x), cache
