"""Offline int8 quantization of wav2vec2-family params for serving.

Replaces the float weights of the encoder's projection/FFN matmuls with
``(w_q8, w_scale)`` pairs that `nnet.linear.Linear` and
`nnet.attention.MultiheadAttention` dispatch on at trace time (the
pytree structure is static under jit, so the quantized branch compiles
with zero runtime checks). Activations are quantized dynamically per
token inside `ops.quant.int8_matmul` — no calibration set needed.

What gets quantized by default: ``ffn1``/``ffn2`` (the FLOP bulk) and
``feat_proj``. ``quantize_attn=True`` additionally quantizes the q/k/v/out
projections (standard MHA only — WavLM's gated rel-pos attention always
stays bf16); measured on-chip that is a slight net LOSS (355.0 vs
351.5 ms flagship forward) — the per-token activation-quant passes cost
more than the small D×D matmuls save, so it is off by default. What
always stays float: the conv frontend (fused Pallas kernel), pos-conv,
all layer norms, biases, and the attention core (score/context matmuls —
small-K, quality-critical).

This is a serving capability beyond the reference (fp16/fp32 only);
measured on v5e the int8 MXU path runs the covered matmuls ~1.5× faster
(tools/int8_probe.py). Inference-only — do not train on the result.

Example
-------
>>> import jax, jax.numpy as jnp
>>> from svt_speechbrain_tpu.models.wav2vec2 import (HuggingFaceWav2Vec2,
...                                                  Wav2Vec2Config)
>>> from svt_speechbrain_tpu.models.quantize import quantize_wav2vec2
>>> cfg = Wav2Vec2Config(hidden_size=32, num_layers=2, num_heads=4,
...                      ffn_size=64, conv_dim=(16,) * 7,
...                      num_conv_pos_embeddings=16,
...                      num_conv_pos_embedding_groups=4)
>>> model = HuggingFaceWav2Vec2(config=cfg)
>>> params = model.init(jax.random.PRNGKey(0))
>>> qparams = quantize_wav2vec2(params)
>>> qparams["encoder"]["layers"]["0"]["ffn1"]["w_q8"].dtype
dtype('int8')
>>> wav = jax.random.normal(jax.random.PRNGKey(1), (2, 3200))
>>> out, qout = model(params, wav), model(qparams, wav)
>>> bool(jnp.abs(out - qout).max() < 0.5)
True
"""
from __future__ import annotations

from svt_speechbrain_tpu.ops.quant import quantize_weight

_MHA_WEIGHTS = ("wq", "wk", "wv", "wo")


def quantize_linear_params(p):
    """``{"w", "b"?}`` → ``{"w_q8", "w_scale", "b"?}`` (w dropped)."""
    out = {k: v for k, v in p.items() if k != "w"}
    out["w_q8"], out["w_scale"] = quantize_weight(p["w"])
    return out


def quantize_mha_params(p):
    """Quantize a standard MHA param dict's four projection matrices."""
    out = {k: v for k, v in p.items() if k not in _MHA_WEIGHTS}
    for name in _MHA_WEIGHTS:
        out[name + "_q8"], out[name + "_scale"] = quantize_weight(p[name])
    return out


def _quantize_encoder_tree(enc, quantize_attn, proj_key):
    """Quantize the ``layers`` dict (and optionally one input-projection
    Linear) of any encoder tree built from `TransformerLayer`."""
    enc = dict(enc)
    layers = {}
    for i, layer in enc["layers"].items():
        layer = dict(layer)
        layer["ffn1"] = quantize_linear_params(layer["ffn1"])
        layer["ffn2"] = quantize_linear_params(layer["ffn2"])
        # WavLM's gated attention dict has no plain-MHA weight set; its
        # attention stays bf16 (FFN-only quantization for that family)
        if quantize_attn and all(k in layer["attn"] for k in _MHA_WEIGHTS) \
                and "gru_w" not in layer["attn"]:
            layer["attn"] = quantize_mha_params(layer["attn"])
        layers[i] = layer
    enc["layers"] = layers
    if proj_key and proj_key in enc:
        enc[proj_key] = quantize_linear_params(enc[proj_key])
    return enc


def quantize_wav2vec2(params, quantize_attn=False, quantize_feat_proj=True):
    """Return a new params tree with int8 projection/FFN weights.

    ``params`` is a `HuggingFaceWav2Vec2` tree (``{"encoder": ...}``) or a
    bare `Wav2Vec2Encoder` tree; the same nesting is returned.
    """
    proj = "feat_proj" if quantize_feat_proj else None
    if "encoder" not in params:
        return _quantize_encoder_tree(params, quantize_attn, proj)
    return dict(params, encoder=_quantize_encoder_tree(
        params["encoder"], quantize_attn, proj))


def quantize_avhubert(params, quantize_attn=False):
    """Int8-quantize an `AVHubertModel` params tree (`models/avhubert.py`):
    the encoder layers share `TransformerLayer` with wav2vec2, plus the
    ``post_extract_proj`` input Linear when present. The audio/video
    sub-model projections and the ResNet frontend stay bf16.

    Example
    -------
    >>> import jax
    >>> from svt_speechbrain_tpu.models.avhubert import (AVHubertConfig,
    ...                                                  AVHubertModel)
    >>> from svt_speechbrain_tpu.models.quantize import quantize_avhubert
    >>> m = AVHubertModel(AVHubertConfig(
    ...     encoder_layers=1, encoder_embed_dim=16, encoder_ffn_embed_dim=32,
    ...     encoder_attention_heads=4, audio_feat_dim=10,
    ...     modality_fuse="concat", conv_pos=8, conv_pos_groups=2))
    >>> q = quantize_avhubert(m.init(jax.random.PRNGKey(0)))
    >>> q["layers"]["0"]["ffn1"]["w_q8"].dtype
    dtype('int8')
    """
    return _quantize_encoder_tree(params, quantize_attn, "post_extract_proj")


def quantize_fusion(params, quantize_attn=False):
    """Int8-quantize a `FusionRCA`/`RCANet` params tree
    (`models/fusion.py`): each RCA layer's FFN linears, plus the shared
    self/cross attention projections when ``quantize_attn`` (FFN-only is
    the measured-win default, as for the encoders).

    Example
    -------
    >>> import jax
    >>> from svt_speechbrain_tpu.models.fusion import FusionRCA
    >>> from svt_speechbrain_tpu.models.quantize import quantize_fusion
    >>> m = FusionRCA(alpha=0.5, nhead=4, d_ffn=32, d_model=16)
    >>> q = quantize_fusion(m.init(jax.random.PRNGKey(0)))
    >>> q["fusion"]["layer1"]["pos_ffn"]["ffn1"]["w_q8"].dtype
    dtype('int8')
    """
    def quantize_rca_layer(layer):
        layer = dict(layer)
        ffn = dict(layer["pos_ffn"])
        ffn["ffn1"] = quantize_linear_params(ffn["ffn1"])
        ffn["ffn2"] = quantize_linear_params(ffn["ffn2"])
        layer["pos_ffn"] = ffn
        if quantize_attn:
            layer["self_att"] = quantize_mha_params(layer["self_att"])
        return layer

    def walk(tree):
        if isinstance(tree, dict):
            if "pos_ffn" in tree and "self_att" in tree:
                return quantize_rca_layer(tree)
            return {k: walk(v) for k, v in tree.items()}
        return tree

    return walk(dict(params))
