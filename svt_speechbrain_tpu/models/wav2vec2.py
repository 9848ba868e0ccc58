"""TPU-native wav2vec 2.0 encoder.

The reference wraps HuggingFace ``Wav2Vec2Model`` behind
``HuggingFaceWav2Vec2`` (``MIR_ST500/huggingface_interface.py:47``; framework
twin ``speechbrain/lobes/models/huggingface_wav2vec.py:46``) and calls it as
``wav → features`` at ~49.8 Hz. Here the architecture is implemented natively
in JAX so the whole AMT forward graph is one XLA program:

- strided-conv waveform frontend (7 layers: (512,k10,s5), 4×(512,k3,s2),
  2×(512,k2,s2)), group-norm ("base"-style) or per-layer layer-norm
  ("large"/lv60-style) + GELU;
- feature projection (LayerNorm → Linear → dropout);
- grouped conv positional embedding (k=128, groups=16, weight-normed) + GELU;
- transformer encoder, post-LN ("base") or pre-LN/"stable layer norm"
  ("large"), erf-GELU FFN;
- optional wav/output global layer-norm replicating the SB bridge's
  ``F.layer_norm(x, x.shape)`` (``huggingface_interface.py:288,296``).

Weights convert 1:1 from HF checkpoints via
``svt_speechbrain_tpu.models.convert_hf``.

TPU notes: everything is static-shape; the conv frontend is 1-D convs that XLA
lowers to MXU convolutions; attention is batched SDPA einsums (Pallas flash
attention can be swapped in via ``ops.flash_attention`` for long windows).
Compute dtype is configurable (bf16 params with f32 softmax/normalization
accumulations by default on TPU).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module, split_rngs, normal_init, kaiming_uniform, uniform_bias, glorot_uniform
from svt_speechbrain_tpu.nnet.cnn import Conv1d, conv_output_length
from svt_speechbrain_tpu.nnet.linear import Linear
from svt_speechbrain_tpu.nnet.normalization import LayerNorm, GroupNorm, layer_norm, global_layer_norm, per_item_layer_norm
from svt_speechbrain_tpu.nnet.attention import MultiheadAttention
from svt_speechbrain_tpu.nnet.dropout import dropout as _dropout
from svt_speechbrain_tpu.nnet.activations import fast_gelu

# The one CI-sized architecture shared by every off-chip harness
# (__graft_entry__ tiny flagship, tools/serving_probe TINY mode): keep it
# in ONE place so "validate the machinery on a small model" always means
# the SAME small model. TINY_FEAT_DIM is the matching head input size.
TINY_ARCH = dict(hidden_size=64, num_layers=2, num_heads=4, ffn_size=128,
                 conv_dim=(32,) * 7, num_conv_pos_embeddings=16,
                 num_conv_pos_embedding_groups=4)
TINY_FEAT_DIM = 64


@dataclasses.dataclass
class Wav2Vec2Config:
    """Architecture hyperparameters. Defaults = wav2vec2-large-lv60, the
    encoder the MIR-ST500 recipe trains (``hparams/train_audio_ssl.yaml:11``)."""

    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    ffn_size: int = 4096
    conv_dim: tuple = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: tuple = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: tuple = (5, 2, 2, 2, 2, 2, 2)
    feat_extract_norm: str = "layer"  # "layer" (large) | "group" (base)
    conv_bias: bool = True            # True for "layer" norm mode
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    do_stable_layer_norm: bool = True  # pre-LN encoder (large); False = post-LN
    layer_norm_eps: float = 1e-5
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    feat_proj_dropout: float = 0.1
    layerdrop: float = 0.0  # LayerDrop is disabled under jit (static graph)
    # --- SSL-family variants the reference bridge name-sniffs
    #     (huggingface_interface.py:217 loads wav2vec2/HuBERT/data2vec/WavLM) ---
    feat_proj_layer_norm: bool = True  # HubertFeatureProjection option
    # "weight_norm": single weight-normed grouped conv (wav2vec2/HuBERT/WavLM)
    # "stacked": depth × [conv k=pos_conv_kernel → non-affine LN → GELU]
    #            (data2vec-audio)
    pos_conv_type: str = "weight_norm"
    pos_conv_depth: int = 5
    pos_conv_kernel: int = 19
    # WavLM gated relative position bias (T5-style buckets, layer-0 embedding
    # shared across layers, per-layer gating)
    rel_pos_bias: bool = False
    num_buckets: int = 320
    max_bucket_distance: int = 800
    # attention dispatch for the encoder layers: "auto" (XLA below 1024
    # frames, Pallas flash above), "flash", or "xla"
    attention_impl: str = "auto"
    # rematerialize the conv feature extractor in the backward pass — its
    # intermediate activations are O(T_samples · 512) and dominate HBM on
    # whole-song windows (minutes of audio); recompute costs ~13% extra FLOPs
    remat_frontend: bool = False
    # rematerialize each transformer layer in the backward pass — trades
    # ~30% extra FLOPs for O(layers) → O(1) activation memory, the standard
    # TPU recipe for fitting larger batches (jax.checkpoint)
    remat: bool = False
    # sequence-parallel activation sharding: a PartitionSpec tuple for the
    # (B, T, H) activations, e.g. ("data", "seq", None) — applied between
    # encoder layers with jax.lax.with_sharding_constraint so layernorm/
    # elementwise regions run on T-shards (Megatron sequence parallelism);
    # XLA inserts the gathers attention/matmuls need. Requires an active
    # mesh context (jax.sharding.set_mesh) at trace time.
    act_sharding: tuple | None = None

    @classmethod
    def base(cls):
        return cls(hidden_size=768, num_layers=12, num_heads=12, ffn_size=3072,
                   feat_extract_norm="group", conv_bias=False,
                   do_stable_layer_norm=False)

    @classmethod
    def large_lv60(cls):
        return cls()

    @classmethod
    def hubert_base(cls):
        """HF ``hubert-base-ls960`` architecture (= wav2vec2-base encoder)."""
        return cls(hidden_size=768, num_layers=12, num_heads=12, ffn_size=3072,
                   feat_extract_norm="group", conv_bias=False,
                   do_stable_layer_norm=False)

    @classmethod
    def hubert_large(cls):
        """HF ``hubert-large-ll60k`` architecture (= wav2vec2-large-lv60)."""
        return cls()

    @classmethod
    def data2vec_audio_base(cls):
        """HF ``data2vec-audio-base``: per-layer LN extractor without conv
        bias, 5-deep stacked positional convs (k=19), post-LN encoder."""
        return cls(hidden_size=768, num_layers=12, num_heads=12, ffn_size=3072,
                   feat_extract_norm="layer", conv_bias=False,
                   do_stable_layer_norm=False, pos_conv_type="stacked")

    @classmethod
    def data2vec_audio_large(cls):
        return cls(feat_extract_norm="layer", conv_bias=False,
                   do_stable_layer_norm=False, pos_conv_type="stacked")

    @classmethod
    def wavlm_base(cls):
        """HF ``wavlm-base(-plus)``: wav2vec2-base encoder + gated relative
        position bias attention."""
        return cls(hidden_size=768, num_layers=12, num_heads=12, ffn_size=3072,
                   feat_extract_norm="group", conv_bias=False,
                   do_stable_layer_norm=False, rel_pos_bias=True)

    @classmethod
    def wavlm_large(cls):
        return cls(conv_bias=False, rel_pos_bias=True)

    def output_length(self, num_samples: int) -> int:
        """Frames produced for ``num_samples`` input samples (≈49.8 Hz at
        16 kHz: stride 320, receptive field 400)."""
        t = num_samples
        for k, s in zip(self.conv_kernel, self.conv_stride):
            t = conv_output_length(t, k, s, padding="valid")
        return t

    def output_length_jnp(self, num_samples):
        """Traced-value version of ``output_length`` (per-row frame counts
        inside jit)."""
        t = jnp.asarray(num_samples)
        for k, s in zip(self.conv_kernel, self.conv_stride):
            t = jnp.maximum((t - k) // s + 1, 0)
        return t


class ConvFeatureExtractor(Module):
    """Strided-conv waveform frontend (HF ``Wav2Vec2FeatureEncoder``)."""

    def __init__(self, config: Wav2Vec2Config):
        self.config = config
        c = config
        self.convs = []
        in_ch = 1
        for i, (dim, k, s) in enumerate(zip(c.conv_dim, c.conv_kernel, c.conv_stride)):
            self.convs.append(Conv1d(dim, k, in_ch, stride=s, padding="valid", bias=c.conv_bias))
            in_ch = dim

    def init(self, rng):
        keys = split_rngs(rng, len(self.convs) + 1)
        params = {}
        c = self.config
        for i, conv in enumerate(self.convs):
            layer = {"conv": conv.init(keys[i])}
            if c.feat_extract_norm == "layer":
                layer["layer_norm"] = LayerNorm(c.conv_dim[i], eps=c.layer_norm_eps).init(None)
            elif i == 0:  # group mode: group-norm after the first conv only
                layer["group_norm"] = GroupNorm(c.conv_dim[0], num_groups=c.conv_dim[0],
                                                eps=c.layer_norm_eps).init(None)
            params[str(i)] = layer
        return params

    def __call__(self, params, wav, true_samples=None, fused=True):
        """wav: (B, T_samples) → (B, T_frames, conv_dim[-1]).

        ``true_samples`` (B,) enables exact-lengths masking for the
        "group" norm mode: torch GroupNorm on (B, C, T) normalizes over
        *time*, so padded frames corrupt its statistics — here the
        stats run over each row's valid frames only, making the base
        model's extractor padding-invariant like the per-frame
        LayerNorm of the "layer" mode already is.

        ``fused=True`` dispatches to the Pallas fused frontend on TPU for
        the standard wav2vec2 schedule in "layer" mode (~23% faster than
        the per-layer XLA convs at batch 64; backward recomputes the XLA
        path, so training an unfrozen extractor should pass fused=False)."""
        c = self.config
        if fused:
            from svt_speechbrain_tpu.ops.conv_frontend import (
                can_fuse, fused_conv_frontend_vjp)

            if can_fuse(c, wav):
                return fused_conv_frontend_vjp(params, wav)
        x = wav[..., None]  # (B, T, 1)
        t_valid = None if true_samples is None else jnp.asarray(true_samples)
        for i, conv in enumerate(self.convs):
            p = params[str(i)]
            x = conv(p["conv"], x)
            if t_valid is not None:
                t_valid = jnp.maximum(
                    (t_valid - c.conv_kernel[i]) // c.conv_stride[i] + 1, 0)
            if c.feat_extract_norm == "layer":
                x = LayerNorm(c.conv_dim[i], eps=c.layer_norm_eps)(p["layer_norm"], x)
            elif i == 0:
                if t_valid is None:
                    x = GroupNorm(c.conv_dim[0], num_groups=c.conv_dim[0],
                                  eps=c.layer_norm_eps)(p["group_norm"], x)
                else:
                    x = _masked_group_norm(p["group_norm"], x, t_valid,
                                           c.conv_dim[0], c.layer_norm_eps)
            x = fast_gelu(x)
        return x


def _masked_group_norm(params, x, t_valid, num_groups, eps):
    """Group norm on (B, T, C) with per-(row, group) statistics over valid
    frames only; junk frames are zeroed on output (gelu(0)=0 keeps them
    zero downstream)."""
    b, t, ch = x.shape
    g = num_groups
    valid = (jnp.arange(t)[None, :] < t_valid[:, None])  # (B, T)
    m = valid[:, :, None, None].astype(jnp.float32)      # (B, T, 1, 1)
    x32 = x.astype(jnp.float32).reshape(b, t, g, ch // g)
    count = jnp.maximum(jnp.sum(m, axis=(1, 3), keepdims=True) * (ch // g), 1.0)
    mean = jnp.sum(x32 * m, axis=(1, 3), keepdims=True) / count
    var = jnp.sum(jnp.square(x32 - mean) * m, axis=(1, 3), keepdims=True) / count
    y = ((x32 - mean) * jax.lax.rsqrt(var + eps)).reshape(b, t, ch)
    y = y * params["scale"] + params["bias"]
    return (y * valid[..., None]).astype(x.dtype)


class ConvPositionalEmbedding(Module):
    """Grouped conv positional embedding with weight-norm parameterization
    (HF ``Wav2Vec2PositionalConvEmbedding``: k=128, groups=16, weight_norm
    over dim=2, one right-most column trimmed for even kernels)."""

    def __init__(self, config: Wav2Vec2Config):
        self.config = config

    def init(self, rng):
        c = self.config
        k = c.num_conv_pos_embeddings
        d = c.hidden_size
        in_per_group = d // c.num_conv_pos_embedding_groups
        wkey, bkey = split_rngs(rng, 2)
        fan_in = in_per_group * k
        # torch layout: (out, in/groups, k); weight_norm dim=2 → g: (1, 1, k).
        # We store v in our conv layout (k, in/groups, out) and g as (k, 1, 1).
        v = kaiming_uniform(wkey, (k, in_per_group, d), fan_in=fan_in)
        g = jnp.sqrt(jnp.sum(jnp.square(v), axis=(1, 2), keepdims=True))
        return {
            "v": v,
            "g": g,
            "b": uniform_bias(bkey, (d,), fan_in=fan_in),
        }

    def __call__(self, params, x):
        c = self.config
        k = c.num_conv_pos_embeddings
        v = params["v"]
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(1, 2), keepdims=True) + 1e-12)
        w = v * (params["g"] / norm)
        pad_total = k // 2 * 2
        conv = Conv1d(c.hidden_size, k, c.hidden_size, stride=1, padding="valid",
                      groups=c.num_conv_pos_embedding_groups, bias=True)
        xp = jnp.pad(x, ((0, 0), (k // 2, k // 2), (0, 0)))
        y = conv({"w": w, "b": params["b"]}, xp)
        if k % 2 == 0:  # trim the extra rightmost frame (HF Wav2Vec2SamePadLayer)
            y = y[:, :-1]
        return fast_gelu(y)


class StackedPositionalConvEmbedding(Module):
    """data2vec-audio positional embedding (HF
    ``Data2VecAudioPositionalConvEmbedding``): ``pos_conv_depth`` stacked
    [grouped conv (same padding, right-trim if even) → non-affine channel
    LayerNorm → GELU] blocks; plain convs, no weight norm."""

    def __init__(self, config: Wav2Vec2Config):
        self.config = config

    def init(self, rng):
        c = self.config
        k = c.pos_conv_kernel
        d = c.hidden_size
        in_per_group = d // c.num_conv_pos_embedding_groups
        fan_in = in_per_group * k
        params = {}
        for i, key in enumerate(split_rngs(rng, c.pos_conv_depth)):
            wkey, bkey = split_rngs(key, 2)
            params[str(i)] = {
                "w": kaiming_uniform(wkey, (k, in_per_group, d), fan_in=fan_in),
                "b": uniform_bias(bkey, (d,), fan_in=fan_in),
            }
        return params

    def __call__(self, params, x):
        c = self.config
        k = c.pos_conv_kernel
        conv = Conv1d(c.hidden_size, k, c.hidden_size, stride=1, padding="valid",
                      groups=c.num_conv_pos_embedding_groups, bias=True)
        for i in range(c.pos_conv_depth):
            xp = jnp.pad(x, ((0, 0), (k // 2, k // 2), (0, 0)))
            y = conv(params[str(i)], xp)
            if k % 2 == 0:
                y = y[:, :-1]
            y = layer_norm(y, axis=-1)  # elementwise_affine=False
            x = fast_gelu(y)
        return x


def _wavlm_relative_position_buckets(t, num_buckets, max_distance):
    """T5-style bidirectional log-bucketed relative positions (HF
    ``WavLMAttention._relative_positions_bucket``). Computed with numpy —
    data-independent, so it folds into the jitted program as a constant."""
    rel = np.arange(t)[None, :] - np.arange(t)[:, None]  # memory - context
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1).astype(np.float64) / max_exact)
        / np.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    return buckets + np.where(is_small, rel, large)


class WavLMSelfAttention(Module):
    """WavLM gated relative-position-bias self-attention (HF
    ``WavLMAttention``): standard QKV attention plus a bucketed relative
    position bias (embedding owned by layer 0, shared across layers) scaled
    per (batch, head, query) by a gate computed from the query stream."""

    def __init__(self, num_heads, hidden_size, has_rel_attn_embed=False,
                 num_buckets=320, max_distance=800, dropout=0.0):
        self.num_heads = num_heads
        self.hidden_size = hidden_size
        self.head_dim = hidden_size // num_heads
        self.has_rel_attn_embed = has_rel_attn_embed
        self.num_buckets = num_buckets
        self.max_distance = max_distance
        self.dropout = dropout

    def init(self, rng):
        d = self.hidden_size
        keys = split_rngs(rng, 6)
        params = {}
        for name, key in zip(("q", "k", "v", "o"), keys[:4]):
            wkey, bkey = split_rngs(key, 2)
            params[f"w{name}"] = kaiming_uniform(wkey, (d, d), fan_in=d)
            params[f"b{name}"] = uniform_bias(bkey, (d,), fan_in=d)
        gw, gb = split_rngs(keys[4], 2)
        params["gru_w"] = kaiming_uniform(gw, (self.head_dim, 8),
                                          fan_in=self.head_dim)
        params["gru_b"] = uniform_bias(gb, (8,), fan_in=self.head_dim)
        params["gru_const"] = jnp.ones((1, self.num_heads, 1, 1), jnp.float32)
        if self.has_rel_attn_embed:
            params["rel_attn_embed"] = (
                jax.random.normal(keys[5], (self.num_buckets, self.num_heads))
                * 0.02)
        return params

    def compute_bias(self, params, t):
        """(H, T, T) relative position bias from this layer's embedding."""
        buckets = _wavlm_relative_position_buckets(
            t, self.num_buckets, self.max_distance)
        return jnp.transpose(params["rel_attn_embed"][buckets], (2, 0, 1))

    def __call__(self, params, x, position_bias, key_padding_mask=None,
                 rng=None, train=False):
        b, t, d = x.shape
        h, hd = self.num_heads, self.head_dim

        # per-layer gate on the shared bias (HF WavLMAttention.forward)
        gated = jnp.transpose(x.reshape(b, t, h, hd), (0, 2, 1, 3))
        proj = gated @ params["gru_w"] + params["gru_b"]
        proj = proj.reshape(b, h, t, 2, 4).sum(-1)
        gate = jax.nn.sigmoid(proj)
        gate_a, gate_b = gate[..., 0:1], gate[..., 1:2]        # (B, H, T, 1)
        gate_out = gate_a * (gate_b * params["gru_const"] - 1.0) + 2.0
        gated_bias = gate_out * position_bias[None]            # (B, H, T, T)

        q = (x @ params["wq"] + params["bq"]).reshape(b, t, h, hd)
        k = (x @ params["wk"] + params["bk"]).reshape(b, t, h, hd)
        v = (x @ params["wv"] + params["bv"]).reshape(b, t, h, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(hd, x.dtype))
        scores = scores + gated_bias
        if key_padding_mask is not None:
            scores = jnp.where(key_padding_mask[:, None, None, :],
                               jnp.finfo(scores.dtype).min, scores)
        attn = jax.nn.softmax(scores, axis=-1)
        if rng is not None:
            attn = _dropout(attn, self.dropout, rng, train)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, d)
        return out @ params["wo"] + params["bo"]


class TransformerLayer(Module):
    """One wav2vec2 encoder layer; pre- or post-LN per config."""

    def __init__(self, config: Wav2Vec2Config, layer_index=0):
        c = config
        self.config = c
        if c.rel_pos_bias:
            self.attn = WavLMSelfAttention(
                c.num_heads, c.hidden_size,
                has_rel_attn_embed=(layer_index == 0),
                num_buckets=c.num_buckets, max_distance=c.max_bucket_distance,
                dropout=c.attention_dropout)
        else:
            self.attn = MultiheadAttention(c.num_heads, c.hidden_size, dropout=c.attention_dropout)
        self.ffn1 = Linear(c.ffn_size, c.hidden_size)
        self.ffn2 = Linear(c.hidden_size, c.ffn_size)
        self.ln1 = LayerNorm(c.hidden_size, eps=c.layer_norm_eps)
        self.ln2 = LayerNorm(c.hidden_size, eps=c.layer_norm_eps)

    def init(self, rng):
        ka, k1, k2, kl1, kl2 = split_rngs(rng, 5)
        return {
            "attn": self.attn.init(ka),
            "ffn1": self.ffn1.init(k1),
            "ffn2": self.ffn2.init(k2),
            "ln1": self.ln1.init(kl1),
            "ln2": self.ln2.init(kl2),
        }

    def __call__(self, params, x, key_padding_mask=None, rng=None, train=False,
                 position_bias=None, key_lengths=None):
        c = self.config
        rngs = split_rngs(rng, 4) if rng is not None else [None] * 4

        def attn_block(h):
            if c.rel_pos_bias:
                out = self.attn(params["attn"], h, position_bias,
                                key_padding_mask=key_padding_mask,
                                rng=rngs[0], train=train)
            elif key_lengths is not None:
                # prefix padding as lengths keeps the flash path available
                out = self.attn(params["attn"], h, h, h, key_lengths=key_lengths,
                                rng=rngs[0], train=train, return_attn_weights=False,
                                impl=c.attention_impl)
            else:
                out = self.attn(params["attn"], h, h, h, key_padding_mask=key_padding_mask,
                                rng=rngs[0], train=train, return_attn_weights=False,
                                impl=c.attention_impl)
            return _dropout(out, c.hidden_dropout, rngs[1], train)

        def ffn_block(h):
            h = self.ffn1(params["ffn1"], h)
            h = fast_gelu(h)
            h = _dropout(h, c.activation_dropout, rngs[2], train)
            h = self.ffn2(params["ffn2"], h)
            return _dropout(h, c.hidden_dropout, rngs[3], train)

        if c.do_stable_layer_norm:  # pre-LN
            x = x + attn_block(self.ln1(params["ln1"], x))
            x = x + ffn_block(self.ln2(params["ln2"], x))
        else:  # post-LN
            x = self.ln1(params["ln1"], x + attn_block(x))
            x = self.ln2(params["ln2"], x + ffn_block(x))
        if c.act_sharding is not None:
            from jax.sharding import PartitionSpec

            x = jax.lax.with_sharding_constraint(
                x, PartitionSpec(*c.act_sharding))
        return x


class Wav2Vec2Encoder(Module):
    """Full wav2vec 2.0 encoder: wav (B, T_samples) → features (B, T_frames, d)."""

    def __init__(self, config: Wav2Vec2Config):
        c = config
        self.config = c
        self.feature_extractor = ConvFeatureExtractor(c)
        self.feat_proj_ln = (LayerNorm(c.conv_dim[-1], eps=c.layer_norm_eps)
                             if c.feat_proj_layer_norm else None)
        self.feat_proj = Linear(c.hidden_size, c.conv_dim[-1])
        self.pos_conv = (StackedPositionalConvEmbedding(c)
                         if c.pos_conv_type == "stacked"
                         else ConvPositionalEmbedding(c))
        self.encoder_ln = LayerNorm(c.hidden_size, eps=c.layer_norm_eps)
        self.layers = [TransformerLayer(c, layer_index=i)
                       for i in range(c.num_layers)]

    def init(self, rng):
        keys = split_rngs(rng, 4 + len(self.layers))
        params = {
            "feat_proj": self.feat_proj.init(keys[2]),
            "feature_extractor": self.feature_extractor.init(keys[0]),
            "pos_conv": self.pos_conv.init(keys[3]),
            "encoder_ln": self.encoder_ln.init(None),
            "layers": {str(i): l.init(k) for i, (l, k) in enumerate(zip(self.layers, keys[4:]))},
        }
        if self.feat_proj_ln is not None:
            params["feat_proj_ln"] = self.feat_proj_ln.init(keys[1])
        return params

    def __call__(self, params, wav, key_padding_mask=None, rng=None, train=False,
                 num_frames=None, true_samples=None, fused_frontend=None):
        """``num_frames`` (B,) enables exact-lengths masking: junk frames
        computed over padding are zeroed before the (zero-padding-equivalent)
        positional conv and excluded from attention, making the padded
        computation equal to running each row unpadded. ``true_samples``
        additionally masks the conv extractor's time-dependent group norm
        (base models). ``fused_frontend`` overrides the Pallas frontend
        dispatch (default: fused when not training; a frozen extractor can
        keep it fused in training since no gradient flows through it)."""
        c = self.config
        fused = (not train) if fused_frontend is None else fused_frontend
        if c.remat_frontend:
            x = jax.checkpoint(
                lambda p, w: self.feature_extractor(
                    p, w, true_samples=true_samples, fused=fused))(
                params["feature_extractor"], wav)
        else:
            x = self.feature_extractor(params["feature_extractor"], wav,
                                       true_samples=true_samples,
                                       fused=fused)
        valid = None
        key_lengths = None
        if num_frames is not None:
            valid = (jnp.arange(x.shape[1])[None, :]
                     < jnp.asarray(num_frames)[:, None])  # (B, F)
            x = x * valid[..., None].astype(x.dtype)
            if key_padding_mask is None:
                key_padding_mask = ~valid
                key_lengths = jnp.asarray(num_frames, jnp.int32)
        if self.feat_proj_ln is not None:
            x = self.feat_proj_ln(params["feat_proj_ln"], x)
        x = self.feat_proj(params["feat_proj"], x)
        if valid is not None:
            # keep padded positions exactly zero into the pos-conv so its
            # boundary behavior matches the unpadded sequence end
            x = x * valid[..., None].astype(x.dtype)
        if rng is not None:
            rng, sub = jax.random.split(rng)
            x = _dropout(x, c.feat_proj_dropout, sub, train)

        x = x + self.pos_conv(params["pos_conv"], x)
        if not c.do_stable_layer_norm:
            x = self.encoder_ln(params["encoder_ln"], x)
        if rng is not None:
            rng, sub = jax.random.split(rng)
            x = _dropout(x, c.hidden_dropout, sub, train)

        position_bias = None
        if c.rel_pos_bias:  # computed once from layer 0, shared by all layers
            position_bias = self.layers[0].attn.compute_bias(
                params["layers"]["0"]["attn"], x.shape[1])

        layer_rngs = split_rngs(rng, len(self.layers)) if rng is not None else [None] * len(self.layers)
        for i, layer in enumerate(self.layers):
            if c.remat:
                x = jax.checkpoint(
                    lambda p, h, pb, _layer=layer, _rng=layer_rngs[i]: _layer(
                        p, h, key_padding_mask=key_padding_mask, rng=_rng,
                        train=train, position_bias=pb,
                        key_lengths=key_lengths))(
                    params["layers"][str(i)], x, position_bias)
            else:
                x = layer(params["layers"][str(i)], x,
                          key_padding_mask=key_padding_mask,
                          rng=layer_rngs[i], train=train,
                          position_bias=position_bias,
                          key_lengths=key_lengths)
        if c.do_stable_layer_norm:
            x = self.encoder_ln(params["encoder_ln"], x)
        return x


def _per_item_masked_norm(x, valid, eps=1e-5):
    """Per-row layer norm over the row's valid positions only — equals the
    reference's ``F.layer_norm(x, x.shape)`` on the unpadded row."""
    x32 = x.astype(jnp.float32)
    m = valid.astype(jnp.float32)
    while m.ndim < x32.ndim:
        m = m[..., None]
    m = jnp.broadcast_to(m, x32.shape)
    axes = tuple(range(1, x32.ndim))
    count = jnp.maximum(jnp.sum(m, axis=axes, keepdims=True), 1.0)
    mean = jnp.sum(x32 * m, axis=axes, keepdims=True) / count
    var = jnp.sum(jnp.square(x32 - mean) * m, axis=axes, keepdims=True) / count
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class HuggingFaceWav2Vec2(Module):
    """Behavioural twin of the SB bridge (``MIR_ST500/huggingface_interface.py:47``):

    ``forward(wav)``: optional whole-tensor input layer-norm (when the HF
    processor would ``do_normalize``), encoder, optional whole-tensor output
    layer-norm; ``freeze`` stops gradients (reference detaches,
    ``huggingface_interface.py:273-277``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> cfg = Wav2Vec2Config(hidden_size=32, num_layers=2, num_heads=4,
    ...                      ffn_size=64, conv_dim=(16,) * 7,
    ...                      num_conv_pos_embeddings=16,
    ...                      num_conv_pos_embedding_groups=4)
    >>> model = HuggingFaceWav2Vec2(config=cfg)
    >>> params = model.init(jax.random.PRNGKey(0))
    >>> out = model(params, jnp.ones((2, 3200)))   # 0.2 s of 16 kHz audio
    >>> out.shape, cfg.output_length(3200)         # 320 samples per frame
    ((2, 9, 32), 9)
    """

    def __init__(self, source=None, save_path=None, config: Wav2Vec2Config = None,
                 output_norm=True, normalize_wav=None, freeze=False,
                 freeze_feature_extractor=False, arch_overrides=None):
        if isinstance(source, Wav2Vec2Config):  # allow positional config
            config, source = source, None
        if config is None:
            # name-sniffed architecture families, like the reference bridge
            # (huggingface_interface.py:217): wav2vec2 / HuBERT / data2vec /
            # WavLM, base or large
            name = (source or "wav2vec2-large-lv60").lower()
            is_base = "base" in name
            if "hubert" in name:
                config = (Wav2Vec2Config.hubert_base() if is_base
                          else Wav2Vec2Config.hubert_large())
            elif "data2vec" in name:
                config = (Wav2Vec2Config.data2vec_audio_base() if is_base
                          else Wav2Vec2Config.data2vec_audio_large())
            elif "wavlm" in name:
                config = (Wav2Vec2Config.wavlm_base() if is_base
                          else Wav2Vec2Config.wavlm_large())
            else:
                config = (Wav2Vec2Config.base() if is_base
                          else Wav2Vec2Config.large_lv60())
        if arch_overrides:
            config = dataclasses.replace(
                config, **{k: tuple(v) if isinstance(v, list) else v
                           for k, v in arch_overrides.items()})
        self.config = config
        self.source = source
        self.save_path = save_path
        self.output_norm = output_norm
        if normalize_wav is None:
            # HF processor do_normalize: True for lv60/robust/xlsr, False for base
            name = (source or "").lower()
            normalize_wav = not name.endswith("base") and "base-960h" not in name
        self.normalize_wav = normalize_wav
        self.freeze = freeze
        self.freeze_feature_extractor = freeze_feature_extractor
        self.encoder = Wav2Vec2Encoder(self.config)

    def init(self, rng):
        return {"encoder": self.encoder.init(rng)}

    def load_pretrained(self):
        """Convert a local HF checkpoint under ``save_path`` (or ``source`` if
        it's a path) to framework params, or None if unavailable.

        The reference downloads from the HF hub at construction
        (``huggingface_interface.py:179``); the zero-egress TPU build expects
        a pre-fetched checkpoint directory.
        """
        import os

        from svt_speechbrain_tpu.models.convert_hf import load_wav2vec2

        for candidate in (self.save_path, self.source):
            if candidate and os.path.exists(candidate):
                params, _ = load_wav2vec2(candidate, self.config)
                return {"encoder": params}
        return None

    def __call__(self, params, wav, rng=None, train=False, row_mask=None,
                 per_item_norm=False, wav_lens=None):
        """``per_item_norm=True`` normalizes each batch row independently —
        identical to the reference at its batch_size=1 eval and invariant to
        batch composition (the batched inference path uses this).

        ``wav_lens`` (relative) enables the exact-lengths path: input/output
        norms use statistics over real content only and padded frames are
        zeroed/masked through the encoder — at batch 1 this is bit-equal to
        running the unpadded waveform (the torch reference's eval regime).
        Implies per-item normalization."""
        from svt_speechbrain_tpu.nnet.normalization import masked_global_layer_norm

        if self.freeze:
            params = jax.lax.stop_gradient(params)
            train = False
        elif self.freeze_feature_extractor:
            params = dict(params, encoder=dict(
                params["encoder"],
                feature_extractor=jax.lax.stop_gradient(params["encoder"]["feature_extractor"]),
            ))
        num_frames = None
        sample_valid = frame_valid = None
        if wav_lens is not None:
            t = wav.shape[1]
            true_samples = jnp.round(jnp.asarray(wav_lens) * t).astype(jnp.int32)
            num_frames = self.config.output_length_jnp(true_samples)
            sample_valid = (jnp.arange(t)[None, :] < true_samples[:, None])
        if self.normalize_wav:
            if wav_lens is not None:
                wav = _per_item_masked_norm(wav, sample_valid)
            elif per_item_norm:
                wav = per_item_layer_norm(wav)
            else:
                wav = global_layer_norm(wav, row_mask=row_mask)
            if sample_valid is not None:
                wav = wav * sample_valid.astype(wav.dtype)
        # a frozen extractor takes no gradient, so the fused Pallas frontend
        # stays profitable even in training steps
        fused_frontend = ((not train) or self.freeze
                          or self.freeze_feature_extractor)
        out = self.encoder(params["encoder"], wav, rng=rng, train=train,
                           num_frames=num_frames,
                           true_samples=None if wav_lens is None else true_samples,
                           fused_frontend=fused_frontend)
        if self.output_norm:
            if wav_lens is not None:
                frame_valid = (jnp.arange(out.shape[1])[None, :]
                               < num_frames[:, None])
                out = _per_item_masked_norm(out, frame_valid)
            elif per_item_norm:
                out = per_item_layer_norm(out)
            else:
                out = global_layer_norm(out, row_mask=row_mask)
        return out

    def extract_features(self, params, wav, rng=None, train=False, row_mask=None,
                         per_item_norm=False):
        return self(params, wav, rng=rng, train=train, row_mask=row_mask,
                    per_item_norm=per_item_norm)
