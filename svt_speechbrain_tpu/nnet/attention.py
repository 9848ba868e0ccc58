"""Attention modules (analogue of reference ``speechbrain/nnet/attention.py``).

``MultiheadAttention`` mirrors the reference wrapper at ``attention.py:642``
(batch-first, optional positional-embedding bias folded into the attention
scores) with torch-``nn.MultiheadAttention``-compatible parameters (packed
q/k/v projection + output projection) so converted checkpoints drop in.

The inner scaled-dot-product runs as one batched einsum chain that XLA maps
straight onto the MXU; for long sequences the Pallas flash-attention kernel in
``svt_speechbrain_tpu.ops.flash_attention`` can be swapped in.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from svt_speechbrain_tpu.nnet.core import Module, glorot_uniform, split_rngs
from svt_speechbrain_tpu.nnet.linear import Linear

NEG_INF = -1e30


def scaled_dot_product_attention(q, k, v, bias=None, mask=None, dropout_rate=0.0,
                                 rng=None, train=False, return_weights=False,
                                 impl="auto", key_lengths=None):
    """q,k,v: (B, H, T, Dh). ``bias`` broadcastable to (B, H, Tq, Tk) added to
    scores; ``mask`` True = masked out.

    ``key_lengths`` (B,) int: prefix-padding mask expressed as each row's
    valid key count — unlike a boolean ``mask`` it keeps the Pallas flash
    path available (the kernel masks in-register and skips dead K panels).

    ``impl``: "auto" dispatches long-sequence attention (unmasked or
    lengths-masked) to the Pallas flash kernel on TPU; "flash" forces it;
    "xla" forces the einsum path (always used when weights/boolean
    mask/bias/dropout are needed).
    """
    dh = q.shape[-1]
    dropout_active = train and rng is not None and dropout_rate > 0.0
    flashable = bias is None and mask is None and not return_weights
    if flashable and impl != "xla":
        from svt_speechbrain_tpu.ops.flash_attention import (
            SHORT_T_MAX, flash_attention, flash_attention_available,
            flash_attention_short)

        long_seq = k.shape[2] >= 1024
        # short rows: the whole (Tq, Tk) score tile fits in VMEM, so the
        # grouped-heads kernel beats both the streaming kernel (grid
        # overhead) and the einsum chain (HBM round-trip of the score
        # tensor). No in-kernel dropout — with dropout active the einsum
        # path below applies it on materialized weights.
        short_seq = k.shape[2] <= SHORT_T_MAX and not dropout_active
        if impl == "flash" and not flash_attention_available():
            import warnings

            warnings.warn(
                "impl='flash' requested but the Pallas flash-attention "
                "kernel is unavailable on this backend; falling back to "
                "the XLA einsum path.", RuntimeWarning, stacklevel=2)
        elif impl == "flash" or (impl == "auto" and long_seq
                                 and flash_attention_available()):
            # attention dropout runs INSIDE the kernels: fwd and bwd
            # regenerate the identical mask from a per-call seed, so
            # training configs with attention_dropout keep the fused path
            seed = None
            rate = 0.0
            if dropout_active:
                seed = jax.random.randint(rng, (), 0, 2 ** 31 - 1,
                                          jnp.int32)
                rate = float(dropout_rate)
            return flash_attention(q, k, v, key_lengths,
                                   dropout_seed=seed, dropout_rate=rate)
        elif impl == "auto" and short_seq and flash_attention_available():
            return flash_attention_short(q, k, v, key_lengths)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores / np.sqrt(dh)
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    if key_lengths is not None:
        kmask = (jnp.arange(k.shape[2])[None, None, None, :]
                 >= jnp.asarray(key_lengths)[:, None, None, None])
        mask = kmask if mask is None else jnp.logical_or(mask, kmask)
    if mask is not None:
        scores = jnp.where(mask, NEG_INF, scores)
    weights = jax.nn.softmax(scores, axis=-1)
    if train and rng is not None and dropout_rate > 0.0:
        keep = 1.0 - dropout_rate
        weights = weights * jax.random.bernoulli(rng, keep, weights.shape) / keep
    out = jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    if return_weights:
        return out, weights
    return out


class MultiheadAttention(Module):
    """Batch-first multi-head attention (reference ``attention.py:642``).

    Call: ``out, weights = mha(params, query, key, value, attn_mask=...,
    key_padding_mask=..., pos_embs=...)``.

    - ``attn_mask``: bool (Tq, Tk) or (B*H/ H, Tq, Tk), True = disallowed —
      torch convention.
    - ``key_padding_mask``: bool (B, Tk), True = pad.
    - ``pos_embs``: float bias broadcastable to (B, H, Tq, Tk), added to the
      scores (the reference folds positional embeddings into the mask arg).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> mha = MultiheadAttention(nhead=4, d_model=16)
    >>> params = mha.init(jax.random.PRNGKey(0))
    >>> x = jnp.ones((2, 6, 16))
    >>> out, weights = mha(params, x, x, x)
    >>> out.shape, weights.shape     # weights averaged over heads
    ((2, 6, 16), (2, 6, 6))
    """

    def __init__(self, nhead, d_model, dropout=0.0, kdim=None, vdim=None):
        self.nhead = nhead
        self.d_model = d_model
        self.dropout = dropout
        self.kdim = kdim or d_model
        self.vdim = vdim or d_model
        if d_model % nhead:
            raise ValueError("d_model must be divisible by nhead")
        self.head_dim = d_model // nhead

    def init(self, rng):
        kq, kk, kv, ko = split_rngs(rng, 4)
        d = self.d_model
        # torch packs q/k/v when kdim==vdim==d_model; we keep them separate but
        # initialize identically (xavier_uniform over the packed matrix).
        return {
            "wq": glorot_uniform(kq, (d, d)),
            "wk": glorot_uniform(kk, (self.kdim, d)),
            "wv": glorot_uniform(kv, (self.vdim, d)),
            "bq": jnp.zeros((d,), jnp.float32),
            "bk": jnp.zeros((d,), jnp.float32),
            "bv": jnp.zeros((d,), jnp.float32),
            "wo": glorot_uniform(ko, (d, d)),
            "bo": jnp.zeros((d,), jnp.float32),
        }

    def __call__(self, params, query, key, value, attn_mask=None,
                 key_padding_mask=None, pos_embs=None, rng=None, train=False,
                 return_attn_weights=True, key_lengths=None, impl="auto"):
        b, tq, _ = query.shape
        tk = key.shape[1]
        h, dh = self.nhead, self.head_dim

        def mm(x, name):
            if name + "_q8" in params:  # int8 serving path (models/quantize.py)
                from svt_speechbrain_tpu.ops.quant import int8_matmul

                return int8_matmul(x, params[name + "_q8"],
                                   params[name + "_scale"])
            return jnp.matmul(x, params[name].astype(x.dtype))

        def proj(x, wname, bname):
            y = mm(x, wname) + params[bname].astype(x.dtype)
            return y.reshape(b, -1, h, dh).transpose(0, 2, 1, 3)  # (B,H,T,Dh)

        q = proj(query, "wq", "bq")
        k = proj(key, "wk", "bk")
        v = proj(value, "wv", "bv")

        mask = None
        if attn_mask is not None:
            am = attn_mask
            if am.ndim == 2:
                am = am[None, None]
            elif am.ndim == 3:
                am = am.reshape(-1, h, tq, tk) if am.shape[0] == b * h else am[:, None]
            mask = am
        if key_padding_mask is not None:
            kpm = key_padding_mask[:, None, None, :]  # (B,1,1,Tk)
            mask = kpm if mask is None else jnp.logical_or(mask, kpm)

        res = scaled_dot_product_attention(
            q, k, v, bias=pos_embs, mask=mask, dropout_rate=self.dropout,
            rng=rng, train=train, return_weights=return_attn_weights,
            key_lengths=key_lengths, impl=impl,
        )
        out, weights = res if return_attn_weights else (res, None)
        out = out.transpose(0, 2, 1, 3).reshape(b, tq, self.d_model)
        out = mm(out, "wo") + params["bo"].astype(out.dtype)
        if return_attn_weights:
            return out, jnp.mean(weights, axis=1)  # torch averages over heads
        return out


class PositionalwiseFeedForward(Module):
    """Transformer FFN applied per position (reference ``attention.py:781``)."""

    def __init__(self, d_ffn, input_size, dropout=0.0, activation="relu"):
        from svt_speechbrain_tpu.nnet.linear import Linear

        self.d_ffn = d_ffn
        self.input_size = input_size
        self.dropout = dropout
        self.activation = activation
        self.ffn1 = Linear(d_ffn, input_size)
        self.ffn2 = Linear(input_size, d_ffn)

    def init(self, rng):
        k1, k2 = split_rngs(rng, 2)
        return {"ffn1": self.ffn1.init(k1), "ffn2": self.ffn2.init(k2)}

    def __call__(self, params, x, rng=None, train=False):
        from svt_speechbrain_tpu.nnet.dropout import dropout as _drop

        h = self.ffn1(params["ffn1"], x)
        h = jax.nn.relu(h) if self.activation == "relu" else jax.nn.gelu(h, approximate=False)
        if rng is not None:
            rng, sub = jax.random.split(rng)
            h = _drop(h, self.dropout, sub, train)
        return self.ffn2(params["ffn2"], h)


class RelPosEncXL(Module):
    """Transformer-XL style relative positional encoding generator
    (reference ``attention.py:328``): emits sinusoidal embeddings for
    positions ``T-1 .. -(T-1)``."""

    def __init__(self, emb_dim):
        self.emb_dim = emb_dim

    def __call__(self, params, x):
        del params
        t = x.shape[1]
        pos = jnp.arange(t - 1, -t, -1, dtype=jnp.float32)[:, None]
        inv_freq = jnp.exp(jnp.arange(0, self.emb_dim, 2, dtype=jnp.float32)
                           * -(np.log(10000.0) / self.emb_dim))
        sinusoid = pos * inv_freq[None, :]
        pe = jnp.zeros((2 * t - 1, self.emb_dim), jnp.float32)
        # the reference reuses sin(|pos|) for future (negative) positions
        # ("same for past and future", attention.py:350) — only the past/
        # future distinction in cos matters (and cos is even anyway)
        pe = pe.at[:, 0::2].set(jnp.sin(jnp.abs(sinusoid)))
        pe = pe.at[:, 1::2].set(jnp.cos(sinusoid))
        return pe[None].astype(x.dtype)


class RelPosMHAXL(Module):
    """Relative-position multi-head attention (Transformer-XL / Conformer
    style; reference ``attention.py:360``)."""

    def __init__(self, embed_dim, num_heads, dropout=0.0, mask_pos_future=False):
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.dropout = dropout
        self.mask_pos_future = mask_pos_future
        self.head_dim = embed_dim // num_heads

    def init(self, rng):
        kq, kk, kv, ko, kp, ku, kvb = split_rngs(rng, 7)
        d = self.embed_dim
        return {
            "wq": glorot_uniform(kq, (d, d)),
            "wk": glorot_uniform(kk, (d, d)),
            "wv": glorot_uniform(kv, (d, d)),
            "wo": glorot_uniform(ko, (d, d)),
            "bo": jnp.zeros((d,), jnp.float32),
            "wpos": glorot_uniform(kp, (d, d)),
            # learned global content/position biases u, v (Transformer-XL)
            "u": glorot_uniform(ku, (self.num_heads, self.head_dim)),
            "v": glorot_uniform(kvb, (self.num_heads, self.head_dim)),
        }

    @staticmethod
    def _rel_shift(x):
        """(B,H,Tq,2*Tk-1) → (B,H,Tq,Tk) Transformer-XL relative shift."""
        b, h, tq, w = x.shape
        tk = (w + 1) // 2
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
        x = x.reshape(b, h, w + 1, tq)
        x = x[:, :, 1:].reshape(b, h, tq, w)
        return x[:, :, :, :tk]

    def __call__(self, params, query, key, value, pos_embs=None, attn_mask=None,
                 key_padding_mask=None, rng=None, train=False):
        b, tq, d = query.shape
        tk = key.shape[1]
        h, dh = self.num_heads, self.head_dim

        q = jnp.matmul(query, params["wq"].astype(query.dtype)).reshape(b, tq, h, dh)
        k = jnp.matmul(key, params["wk"].astype(key.dtype)).reshape(b, tk, h, dh).transpose(0, 2, 1, 3)
        v = jnp.matmul(value, params["wv"].astype(value.dtype)).reshape(b, tk, h, dh).transpose(0, 2, 1, 3)
        p = jnp.matmul(pos_embs, params["wpos"].astype(pos_embs.dtype))  # (1, 2T-1, d)
        p = p.reshape(1, -1, h, dh).transpose(0, 2, 1, 3)  # (1,H,2T-1,Dh)

        q_u = (q + params["u"].astype(q.dtype)).transpose(0, 2, 1, 3)  # (B,H,Tq,Dh)
        q_v = (q + params["v"].astype(q.dtype)).transpose(0, 2, 1, 3)
        ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k, preferred_element_type=jnp.float32)
        bd = jnp.einsum("bhqd,bhkd->bhqk", q_v, jnp.broadcast_to(p, (b,) + p.shape[1:]),
                        preferred_element_type=jnp.float32)
        # the reference scales by 1/sqrt(embed_dim) — NOT head_dim
        # (attention.py:451, a deliberate speechbrain quirk)
        scores = (ac + self._rel_shift(bd)) / np.sqrt(d)

        mask = None
        if attn_mask is not None:
            mask = attn_mask[None, None] if attn_mask.ndim == 2 else attn_mask[:, None]
        if key_padding_mask is not None:
            kpm = key_padding_mask[:, None, None, :]
            mask = kpm if mask is None else jnp.logical_or(mask, kpm)
        if mask is not None:
            scores = jnp.where(mask, NEG_INF, scores)
        weights = jax.nn.softmax(scores, axis=-1)
        if train and rng is not None and self.dropout > 0:
            keep = 1.0 - self.dropout
            weights = weights * jax.random.bernoulli(rng, keep, weights.shape) / keep
        out = jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, tq, d)
        out = jnp.matmul(out, params["wo"].astype(out.dtype)) + params["bo"].astype(out.dtype)
        return out, jnp.mean(weights, axis=1)


class ContentBasedAttention(Module):
    """Bahdanau additive attention (reference ``attention.py:23``).

    Functional: ``(params, enc_states, enc_len, dec_states) → (context, w)``
    with ``enc_len`` in absolute frames; the reference's ``reset()`` memo of
    the projected encoder is an XLA CSE concern, not an API one.
    """

    def __init__(self, enc_dim, dec_dim, attn_dim, output_dim, scaling=1.0):
        self.mlp_enc = Linear(attn_dim, enc_dim)
        self.mlp_dec = Linear(attn_dim, dec_dim)
        self.mlp_attn = Linear(1, attn_dim, bias=False)
        self.mlp_out = Linear(output_dim, enc_dim)
        self.scaling = scaling

    def init(self, rng):
        k1, k2, k3, k4 = split_rngs(rng, 4)
        return {"mlp_enc": self.mlp_enc.init(k1), "mlp_dec": self.mlp_dec.init(k2),
                "mlp_attn": self.mlp_attn.init(k3), "mlp_out": self.mlp_out.init(k4)}

    def _mask(self, enc_states, enc_len):
        t = enc_states.shape[1]
        return jnp.arange(t)[None, :] < jnp.asarray(enc_len)[:, None]

    def __call__(self, params, enc_states, enc_len, dec_states):
        enc_h = self.mlp_enc(params["mlp_enc"], enc_states)
        dec_h = self.mlp_dec(params["mlp_dec"], dec_states)[:, None]
        attn = self.mlp_attn(params["mlp_attn"], jnp.tanh(enc_h + dec_h))[..., 0]
        attn = jnp.where(self._mask(enc_states, enc_len), attn, -jnp.inf)
        attn = jax.nn.softmax(attn * self.scaling, axis=-1)
        context = jnp.einsum("bt,btf->bf", attn, enc_states)
        return self.mlp_out(params["mlp_out"], context), attn


class LocationAwareAttention(ContentBasedAttention):
    """Chorowski location-aware attention (reference ``attention.py:113``):
    adds a conv feature over the previous step's attention weights. The
    reference keeps ``prev_attn`` as module state; here the caller threads it
    (``prev_attn=None`` reproduces the reference's uniform 1/len start)."""

    def __init__(self, enc_dim, dec_dim, attn_dim, output_dim, conv_channels,
                 kernel_size, scaling=1.0):
        super().__init__(enc_dim, dec_dim, attn_dim, output_dim, scaling)
        from svt_speechbrain_tpu.nnet.cnn import Conv1d

        self.conv_loc = Conv1d(conv_channels, 2 * kernel_size + 1, 1,
                               padding="same", bias=False)
        self.mlp_loc = Linear(attn_dim, conv_channels)

    def init(self, rng):
        base, k1, k2 = split_rngs(rng, 3)
        params = super().init(base)
        params["conv_loc"] = self.conv_loc.init(k1)
        params["mlp_loc"] = self.mlp_loc.init(k2)
        return params

    def __call__(self, params, enc_states, enc_len, dec_states, prev_attn=None):
        mask = self._mask(enc_states, enc_len)
        if prev_attn is None:  # uniform over real frames
            prev_attn = mask / jnp.asarray(enc_len, jnp.float32)[:, None]
        attn_conv = self.conv_loc(params["conv_loc"], prev_attn[..., None])
        attn_conv = self.mlp_loc(params["mlp_loc"], attn_conv)
        enc_h = self.mlp_enc(params["mlp_enc"], enc_states)
        dec_h = self.mlp_dec(params["mlp_dec"], dec_states)[:, None]
        attn = self.mlp_attn(params["mlp_attn"],
                             jnp.tanh(enc_h + dec_h + attn_conv))[..., 0]
        attn = jnp.where(mask, attn, -jnp.inf)
        attn = jax.nn.softmax(attn * self.scaling, axis=-1)
        context = jnp.einsum("bt,btf->bf", attn, enc_states)
        return self.mlp_out(params["mlp_out"], context), attn


class KeyValueAttention(Module):
    """Single-head scaled dot-product key/value attention
    (reference ``attention.py:237``)."""

    def __init__(self, enc_dim, dec_dim, attn_dim, output_dim):
        self.key_linear = Linear(attn_dim, enc_dim)
        self.query_linear = Linear(attn_dim, dec_dim)
        self.value_linear = Linear(output_dim, enc_dim)
        self.scaling = attn_dim ** 0.5

    def init(self, rng):
        k1, k2, k3 = split_rngs(rng, 3)
        return {"key_linear": self.key_linear.init(k1),
                "query_linear": self.query_linear.init(k2),
                "value_linear": self.value_linear.init(k3)}

    def __call__(self, params, enc_states, enc_len, dec_states):
        keys = self.key_linear(params["key_linear"], enc_states)
        values = self.value_linear(params["value_linear"], enc_states)
        query = self.query_linear(params["query_linear"], dec_states)
        scores = jnp.einsum("btf,bf->bt", keys, query) / self.scaling
        t = enc_states.shape[1]
        mask = jnp.arange(t)[None, :] < jnp.asarray(enc_len)[:, None]
        scores = jnp.where(mask, scores, -jnp.inf)
        w = jax.nn.softmax(scores, axis=1)
        return jnp.einsum("bt,btf->bf", w, values), w[:, None]
