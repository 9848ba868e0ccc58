"""Convert HuggingFace wav2vec2-family checkpoints to framework param pytrees.

The reference loads ``transformers`` models from the HF hub at YAML-instantiation
time (``MIR_ST500/huggingface_interface.py:179``). Here conversion is an
explicit offline step: read a local checkpoint (safetensors preferred, torch
``pytorch_model.bin`` fallback), emit the nested numpy/jnp dict expected by
``models.wav2vec2.Wav2Vec2Encoder``.

Layout changes (torch → TPU-native):
- ``nn.Linear``   (out, in)           → ``w`` (in, out)  [transpose]
- ``nn.Conv1d``   (out, in/groups, k) → ``w`` (k, in/groups, out)
- weight-normed pos-conv ``weight_g`` (1, 1, k) → ``g`` (k, 1, 1);
  ``weight_v`` like Conv1d. Handles both classic ``weight_g/weight_v`` and
  the parametrize-style ``parametrizations.weight.original0/1`` key names.
"""
from __future__ import annotations

import os

import numpy as np


def _t(x):
    return np.ascontiguousarray(np.asarray(x).T)


def _conv_w(x):
    # (out, in/groups, k) -> (k, in/groups, out)
    return np.ascontiguousarray(np.transpose(np.asarray(x), (2, 1, 0)))


def load_state_dict(path):
    """Load a flat name→numpy dict from a HF checkpoint directory or file."""
    if os.path.isdir(path):
        for candidate in ("model.safetensors", "pytorch_model.bin"):
            f = os.path.join(path, candidate)
            if os.path.exists(f):
                path = f
                break
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def convert_wav2vec2_state_dict(sd, config):
    """HF state dict → ``Wav2Vec2Encoder`` params. Handles the whole
    name-sniffed family: ``Wav2Vec2Model``, ``HubertModel`` (optional feature
    projection LN), ``Data2VecAudioModel`` (stacked plain pos convs),
    ``WavLMModel`` (gated relative-position-bias attention).

    Example
    -------
    >>> import jax, numpy as np, jax.tree_util as jtu
    >>> from transformers import Wav2Vec2Config as HFConfig, Wav2Vec2Model
    >>> from svt_speechbrain_tpu.models.wav2vec2 import (Wav2Vec2Config,
    ...                                                  Wav2Vec2Encoder)
    >>> hf = Wav2Vec2Model(HFConfig(
    ...     hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
    ...     intermediate_size=64, conv_dim=(16,) * 7, conv_bias=True,
    ...     num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    ...     do_stable_layer_norm=True, feat_extract_norm="layer"))
    >>> sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    >>> cfg = Wav2Vec2Config(hidden_size=32, num_layers=2, num_heads=4,
    ...                      ffn_size=64, conv_dim=(16,) * 7,
    ...                      num_conv_pos_embeddings=16,
    ...                      num_conv_pos_embedding_groups=4)
    >>> params = convert_wav2vec2_state_dict(sd, cfg)
    >>> ref = jax.eval_shape(lambda r: Wav2Vec2Encoder(cfg).init(r),
    ...                      jax.random.PRNGKey(0))
    >>> jtu.tree_structure(params) == jtu.tree_structure(ref)
    True
    >>> all(np.shape(a) == b.shape for a, b in
    ...     zip(jtu.tree_leaves(params), jtu.tree_leaves(ref)))
    True
    """
    for prefix in ("wav2vec2.", "hubert.", "data2vec_audio.", "wavlm."):
        sd = {k.removeprefix(prefix): v for k, v in sd.items()}

    def get(key):
        return np.asarray(sd[key])

    params = {}

    # conv feature extractor
    fe = {}
    for i in range(len(config.conv_dim)):
        pre = f"feature_extractor.conv_layers.{i}."
        layer = {"conv": {"w": _conv_w(get(pre + "conv.weight"))}}
        if pre + "conv.bias" in sd:
            layer["conv"]["b"] = get(pre + "conv.bias")
        if config.feat_extract_norm == "layer":
            layer["layer_norm"] = {
                "scale": get(pre + "layer_norm.weight"),
                "bias": get(pre + "layer_norm.bias"),
            }
        elif i == 0:
            layer["group_norm"] = {
                "scale": get(pre + "layer_norm.weight"),
                "bias": get(pre + "layer_norm.bias"),
            }
        fe[str(i)] = layer
    params["feature_extractor"] = fe

    if getattr(config, "feat_proj_layer_norm", True):
        params["feat_proj_ln"] = {
            "scale": get("feature_projection.layer_norm.weight"),
            "bias": get("feature_projection.layer_norm.bias"),
        }
    params["feat_proj"] = {
        "w": _t(get("feature_projection.projection.weight")),
        "b": get("feature_projection.projection.bias"),
    }

    if getattr(config, "pos_conv_type", "weight_norm") == "stacked":
        # data2vec-audio: depth × plain grouped convs
        params["pos_conv"] = {}
        for i in range(config.pos_conv_depth):
            pre = f"encoder.pos_conv_embed.layers.{i}.conv."
            params["pos_conv"][str(i)] = {
                "w": _conv_w(get(pre + "weight")),
                "b": get(pre + "bias"),
            }
    else:
        # positional conv (weight-normed)
        pc = "encoder.pos_conv_embed.conv."
        if pc + "weight_g" in sd:
            g, v = get(pc + "weight_g"), get(pc + "weight_v")
        else:
            g = get(pc + "parametrizations.weight.original0")
            v = get(pc + "parametrizations.weight.original1")
        params["pos_conv"] = {
            "g": np.ascontiguousarray(np.transpose(g, (2, 1, 0))),  # (1,1,k)->(k,1,1)
            "v": _conv_w(v),
            "b": get(pc + "bias"),
        }

    params["encoder_ln"] = {
        "scale": get("encoder.layer_norm.weight"),
        "bias": get("encoder.layer_norm.bias"),
    }

    layers = {}
    for i in range(config.num_layers):
        pre = f"encoder.layers.{i}."
        attn = {
            "wq": _t(get(pre + "attention.q_proj.weight")),
            "bq": get(pre + "attention.q_proj.bias"),
            "wk": _t(get(pre + "attention.k_proj.weight")),
            "bk": get(pre + "attention.k_proj.bias"),
            "wv": _t(get(pre + "attention.v_proj.weight")),
            "bv": get(pre + "attention.v_proj.bias"),
            "wo": _t(get(pre + "attention.out_proj.weight")),
            "bo": get(pre + "attention.out_proj.bias"),
        }
        if getattr(config, "rel_pos_bias", False):  # WavLM gated rel-pos attn
            attn["gru_const"] = get(pre + "attention.gru_rel_pos_const")
            attn["gru_w"] = _t(get(pre + "attention.gru_rel_pos_linear.weight"))
            attn["gru_b"] = get(pre + "attention.gru_rel_pos_linear.bias")
            if i == 0:
                attn["rel_attn_embed"] = get(
                    pre + "attention.rel_attn_embed.weight")
        layers[str(i)] = {
            "attn": attn,
            "ln1": {
                "scale": get(pre + "layer_norm.weight"),
                "bias": get(pre + "layer_norm.bias"),
            },
            "ln2": {
                "scale": get(pre + "final_layer_norm.weight"),
                "bias": get(pre + "final_layer_norm.bias"),
            },
            "ffn1": {
                "w": _t(get(pre + "feed_forward.intermediate_dense.weight")),
                "b": get(pre + "feed_forward.intermediate_dense.bias"),
            },
            "ffn2": {
                "w": _t(get(pre + "feed_forward.output_dense.weight")),
                "b": get(pre + "feed_forward.output_dense.bias"),
            },
        }
    params["layers"] = layers
    return params


def load_wav2vec2(path, config=None):
    """Load + convert an HF wav2vec2 checkpoint; infers the config from
    ``config.json`` when present."""
    from svt_speechbrain_tpu.models.wav2vec2 import Wav2Vec2Config

    if config is None:
        import json

        cfg_file = os.path.join(path, "config.json") if os.path.isdir(path) else None
        if cfg_file and os.path.exists(cfg_file):
            with open(cfg_file) as f:
                hf = json.load(f)
            model_type = hf.get("model_type", "wav2vec2")
            config = Wav2Vec2Config(
                hidden_size=hf["hidden_size"],
                num_layers=hf["num_hidden_layers"],
                num_heads=hf["num_attention_heads"],
                ffn_size=hf["intermediate_size"],
                conv_dim=tuple(hf["conv_dim"]),
                conv_kernel=tuple(hf["conv_kernel"]),
                conv_stride=tuple(hf["conv_stride"]),
                # data2vec-audio configs omit feat_extract_norm (their
                # extractor is always per-layer LN)
                feat_extract_norm=hf.get(
                    "feat_extract_norm",
                    "layer" if model_type == "data2vec-audio" else "group"),
                conv_bias=hf.get("conv_bias", False),
                num_conv_pos_embeddings=hf["num_conv_pos_embeddings"],
                num_conv_pos_embedding_groups=hf["num_conv_pos_embedding_groups"],
                do_stable_layer_norm=hf.get("do_stable_layer_norm", False),
                layer_norm_eps=hf.get("layer_norm_eps", 1e-5),
                feat_proj_layer_norm=hf.get("feat_proj_layer_norm", True),
                pos_conv_type=("stacked" if model_type == "data2vec-audio"
                               else "weight_norm"),
                pos_conv_depth=hf.get("num_conv_pos_embeddings", 5)
                if model_type == "data2vec-audio" else 5,
                pos_conv_kernel=hf.get("conv_pos_kernel_size", 19),
                rel_pos_bias=(model_type == "wavlm"),
                num_buckets=hf.get("num_buckets", 320),
                max_bucket_distance=hf.get("max_bucket_distance", 800),
            )
        else:
            config = Wav2Vec2Config.large_lv60()
    sd = load_state_dict(path)
    return convert_wav2vec2_state_dict(sd, config), config
