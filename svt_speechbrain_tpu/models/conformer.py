"""Conformer encoder (analogue of reference
``speechbrain/lobes/models/transformer/Conformer.py``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module, split_rngs
from svt_speechbrain_tpu.nnet.linear import Linear
from svt_speechbrain_tpu.nnet.cnn import Conv1d
from svt_speechbrain_tpu.nnet.normalization import BatchNorm1d, LayerNorm
from svt_speechbrain_tpu.nnet.attention import RelPosMHAXL, RelPosEncXL, MultiheadAttention
from svt_speechbrain_tpu.nnet.activations import Swish
from svt_speechbrain_tpu.nnet.dropout import dropout as _dropout


class ConvolutionModule(Module):
    """Pointwise → GLU → depthwise → BatchNorm+Swish → pointwise
    (reference ``Conformer.py:24``; running stats in the state tree)."""

    def __init__(self, input_size, kernel_size=31, bias=True, causal=False,
                 dilation=1):
        self.causal = causal
        self.pw1 = Linear(2 * input_size, input_size, bias=bias)
        self.dw = Conv1d(input_size, kernel_size, input_size, groups=input_size,
                         padding="causal" if causal else "same",
                         dilation=dilation, bias=bias)
        self.norm = BatchNorm1d(input_size)
        self.pw2 = Linear(input_size, input_size, bias=bias)
        self.pre_norm = LayerNorm(input_size)

    def init(self, rng):
        k1, k2, k3 = split_rngs(rng, 3)
        return {"pre_norm": self.pre_norm.init(None), "pw1": self.pw1.init(k1),
                "dw": self.dw.init(k2), "norm": self.norm.init(None),
                "pw2": self.pw2.init(k3)}

    def init_state(self):
        return self.norm.init_state()

    def __call__(self, params, x, state=None, train=False):
        return_state = state is not None
        if state is None:
            state = self.init_state()
        h = self.pre_norm(params["pre_norm"], x)
        h = self.pw1(params["pw1"], h)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(b)  # GLU
        h = self.dw(params["dw"], h)
        h, new_state = self.norm(params["norm"], state, h, train=train)
        h = h * jax.nn.sigmoid(h)  # swish
        out = self.pw2(params["pw2"], h)
        if return_state:
            return out, new_state
        return out


class ConformerEncoderLayer(Module):
    """Half-FFN → MHSA(rel-pos) → conv module → half-FFN → LN
    (reference ``Conformer.py:101``)."""

    def __init__(self, d_model, d_ffn, nhead, kernel_size=31, dropout=0.0,
                 causal=False, attention_type="RelPosMHAXL"):
        self.attention_type = attention_type
        if attention_type == "RelPosMHAXL":
            self.mha = RelPosMHAXL(d_model, nhead, dropout, mask_pos_future=causal)
        else:
            self.mha = MultiheadAttention(nhead, d_model, dropout=dropout)
        self.conv = ConvolutionModule(d_model, kernel_size, causal=causal)
        self.ffn1 = (Linear(d_ffn, d_model), Linear(d_model, d_ffn))
        self.ffn2 = (Linear(d_ffn, d_model), Linear(d_model, d_ffn))
        self.norm_ff1 = LayerNorm(d_model)
        self.norm_mha = LayerNorm(d_model)
        self.norm_ff2 = LayerNorm(d_model)
        self.norm_out = LayerNorm(d_model)
        self.dropout = dropout
        self.swish = Swish()

    def init(self, rng):
        keys = split_rngs(rng, 6)
        return {
            "mha": self.mha.init(keys[0]), "conv": self.conv.init(keys[1]),
            "ffn1_a": self.ffn1[0].init(keys[2]), "ffn1_b": self.ffn1[1].init(keys[3]),
            "ffn2_a": self.ffn2[0].init(keys[4]), "ffn2_b": self.ffn2[1].init(keys[5]),
            "norm_ff1": self.norm_ff1.init(None), "norm_mha": self.norm_mha.init(None),
            "norm_ff2": self.norm_ff2.init(None), "norm_out": self.norm_out.init(None),
        }

    def _half_ffn(self, params, x, which, rng, train):
        h = self.ffn1 if which == 1 else self.ffn2
        pa, pb = params[f"ffn{which}_a"], params[f"ffn{which}_b"]
        norm = params[f"norm_ff{which}"]
        ln = self.norm_ff1 if which == 1 else self.norm_ff2
        y = ln(norm, x)
        y = h[0](pa, y)
        y = self.swish(None, y)
        y = _dropout(y, self.dropout, rng, train)
        return h[1](pb, y)

    def init_state(self):
        return {"conv": self.conv.init_state()}

    def __call__(self, params, x, pos_embs=None, src_key_padding_mask=None,
                 rng=None, train=False, state=None):
        return_state = state is not None
        if state is None:
            state = self.init_state()
        rngs = split_rngs(rng, 4) if rng is not None else [None] * 4
        x = x + 0.5 * self._half_ffn(params, x, 1, rngs[0], train)
        h = self.norm_mha(params["norm_mha"], x)
        if self.attention_type == "RelPosMHAXL":
            attn_out, _ = self.mha(params["mha"], h, h, h, pos_embs=pos_embs,
                                   key_padding_mask=src_key_padding_mask,
                                   rng=rngs[1], train=train)
        else:
            attn_out, _ = self.mha(params["mha"], h, h, h,
                                   key_padding_mask=src_key_padding_mask,
                                   rng=rngs[1], train=train)
        x = x + _dropout(attn_out, self.dropout, rngs[2], train)
        conv_out, conv_state = self.conv(params["conv"], x,
                                         state=state["conv"], train=train)
        x = x + conv_out
        x = x + 0.5 * self._half_ffn(params, x, 2, rngs[3], train)
        out = self.norm_out(params["norm_out"], x)
        if return_state:
            return out, {"conv": conv_state}
        return out


class ConformerEncoder(Module):
    """Conformer encoder stack (reference ``Conformer.py:300``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> enc = ConformerEncoder(num_layers=2, d_model=32, d_ffn=64, nhead=4,
    ...                        kernel_size=7)
    >>> params = enc.init(jax.random.PRNGKey(0))
    >>> enc(params, jnp.ones((2, 12, 32))).shape
    (2, 12, 32)
    """

    def __init__(self, num_layers, d_model, d_ffn, nhead, kernel_size=31,
                 dropout=0.0, causal=False, attention_type="RelPosMHAXL"):
        self.layers = [
            ConformerEncoderLayer(d_model, d_ffn, nhead, kernel_size, dropout,
                                  causal, attention_type)
            for _ in range(num_layers)
        ]
        self.pos_enc = RelPosEncXL(d_model) if attention_type == "RelPosMHAXL" else None
        self.attention_type = attention_type

    def init(self, rng):
        keys = split_rngs(rng, len(self.layers))
        return {str(i): l.init(k) for i, (l, k) in enumerate(zip(self.layers, keys))}

    def init_state(self):
        return {str(i): l.init_state() for i, l in enumerate(self.layers)}

    def __call__(self, params, x, src_key_padding_mask=None, rng=None,
                 train=False, state=None):
        return_state = state is not None
        if state is None:
            state = self.init_state()
        new_state = {}
        pos_embs = self.pos_enc(None, x) if self.pos_enc is not None else None
        rngs = split_rngs(rng, len(self.layers)) if rng is not None else [None] * len(self.layers)
        for i, layer in enumerate(self.layers):
            x, new_state[str(i)] = layer(
                params[str(i)], x, pos_embs=pos_embs,
                src_key_padding_mask=src_key_padding_mask,
                rng=rngs[i], train=train, state=state[str(i)])
        if return_state:
            return x, new_state
        return x


class ConformerDecoderLayer(Module):
    """Causal conformer decoder layer (reference ``Conformer.py:446``):
    encoder-layer recipe with look-ahead-masked self-attention plus a
    cross-attention block over the encoder memory."""

    def __init__(self, d_model, d_ffn, nhead, kernel_size=31, dropout=0.0):
        self.inner = ConformerEncoderLayer(d_model, d_ffn, nhead,
                                           kernel_size=kernel_size,
                                           dropout=dropout, causal=True,
                                           attention_type="regularMHA")
        self.cross = MultiheadAttention(nhead, d_model, dropout=dropout)
        self.norm_cross = LayerNorm(d_model)
        self.dropout = dropout

    def init(self, rng):
        k1, k2 = split_rngs(rng, 2)
        return {"inner": self.inner.init(k1), "cross": self.cross.init(k2),
                "norm_cross": self.norm_cross.init(None)}

    def __call__(self, params, tgt, memory, memory_key_padding_mask=None,
                 rng=None, train=False):
        r1, r2 = split_rngs(rng, 2) if rng is not None else (None, None)
        t = tgt.shape[1]
        causal = jnp.tril(jnp.ones((t, t), bool))
        h = self.inner.norm_mha(params["inner"]["norm_mha"], tgt)
        attn_out, _ = self.inner.mha(params["inner"]["mha"], h, h, h,
                                     attn_mask=~causal, rng=r1, train=train)
        x = tgt + 0.5 * self.inner._half_ffn(params["inner"], tgt, 1, None, train)
        x = x + attn_out
        # cross attention over the encoder memory
        hc = self.norm_cross(params["norm_cross"], x)
        cross_out = self.cross(params["cross"], hc, memory, memory,
                               key_padding_mask=memory_key_padding_mask,
                               rng=r2, train=train, return_attn_weights=False)
        x = x + cross_out
        x = x + self.inner.conv(params["inner"]["conv"], x)
        x = x + 0.5 * self.inner._half_ffn(params["inner"], x, 2, None, train)
        return self.inner.norm_out(params["inner"]["norm_out"], x)


class ConformerDecoder(Module):
    """Stack of causal conformer decoder layers
    (reference ``Conformer.py:554``)."""

    def __init__(self, num_layers, nhead, d_ffn, d_model, kernel_size=31,
                 dropout=0.0):
        self.layers = [ConformerDecoderLayer(d_model, d_ffn, nhead,
                                             kernel_size=kernel_size,
                                             dropout=dropout)
                       for _ in range(num_layers)]

    def init(self, rng):
        keys = split_rngs(rng, len(self.layers))
        return {str(i): l.init(k) for i, (l, k) in enumerate(zip(self.layers, keys))}

    def __call__(self, params, tgt, memory, memory_key_padding_mask=None,
                 rng=None, train=False):
        rngs = split_rngs(rng, len(self.layers)) if rng is not None else [None] * len(self.layers)
        for i, layer in enumerate(self.layers):
            tgt = layer(params[str(i)], tgt, memory,
                        memory_key_padding_mask=memory_key_padding_mask,
                        rng=rngs[i], train=train)
        return tgt
