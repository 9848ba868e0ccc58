"""Convert fairseq AV-HuBERT checkpoints to framework param/state pytrees.

The reference loads AV-HuBERT via
``fairseq.checkpoint_utils.load_model_ensemble_and_task``
(``N20EMv2/video_only/fairseq_interface.py:230``), which needs the whole
fairseq task registry. Here conversion is a plain state-dict mapping:
torch layouts → channel-last framework layouts, BatchNorm running statistics
split into the explicit state tree.
"""
from __future__ import annotations

import numpy as np


def _t(x):
    return np.ascontiguousarray(np.asarray(x).T)


def _conv2d_w(x):  # (out, in, kh, kw) -> (kh, kw, in, out)
    """torch conv weight layout → channel-last jax layout.

    Example
    -------
    >>> import numpy as np
    >>> _conv2d_w(np.zeros((8, 3, 5, 7))).shape
    (5, 7, 3, 8)
    """
    return np.ascontiguousarray(np.transpose(np.asarray(x), (2, 3, 1, 0)))


def _conv3d_w(x):  # (out, in, kt, kh, kw) -> (kt, kh, kw, in, out)
    return np.ascontiguousarray(np.transpose(np.asarray(x), (2, 3, 4, 1, 0)))


def load_fairseq_state_dict(path):
    """Flat name → numpy dict from a fairseq checkpoint file."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    if hasattr(sd, "items"):
        return {k: np.asarray(v) for k, v in sd.items() if hasattr(v, "numpy") or isinstance(v, np.ndarray)}
    raise ValueError(f"Unrecognized checkpoint format at {path}")


def _convert_bn(sd, prefix):
    params = {"scale": np.asarray(sd[prefix + "weight"]),
              "bias": np.asarray(sd[prefix + "bias"])}
    state = {"mean": np.asarray(sd[prefix + "running_mean"]),
             "var": np.asarray(sd[prefix + "running_var"])}
    return params, state


def _convert_basic_block(sd, prefix, has_downsample):
    params = {
        "conv1": {"w": _conv2d_w(sd[prefix + "conv1.weight"])},
        "conv2": {"w": _conv2d_w(sd[prefix + "conv2.weight"])},
        "relu1": {"alpha": np.asarray(sd[prefix + "relu1.weight"])},
        "relu2": {"alpha": np.asarray(sd[prefix + "relu2.weight"])},
    }
    state = {}
    params["bn1"], state["bn1"] = _convert_bn(sd, prefix + "bn1.")
    params["bn2"], state["bn2"] = _convert_bn(sd, prefix + "bn2.")
    if has_downsample:
        params["down_conv"] = {"w": _conv2d_w(sd[prefix + "downsample.0.weight"])}
        params["down_bn"], state["down_bn"] = _convert_bn(sd, prefix + "downsample.1.")
    return params, state


def convert_resnet(sd, prefix="feature_extractor_video.resnet."):
    """ResEncoder weights (frontend3D + trunk) → (params, state)."""
    params = {"frontend_conv": {"w": _conv3d_w(sd[prefix + "frontend3D.0.weight"])},
              "frontend_act": {"alpha": np.asarray(sd[prefix + "frontend3D.2.weight"])}}
    state = {}
    params["frontend_bn"], state["frontend_bn"] = _convert_bn(sd, prefix + "frontend3D.1.")
    trunk_p, trunk_s = {}, {}
    layers = (2, 2, 2, 2)
    for s, n_blocks in enumerate(layers):
        for b in range(n_blocks):
            tprefix = f"{prefix}trunk.layer{s + 1}.{b}."
            has_down = (tprefix + "downsample.0.weight") in sd
            p, st = _convert_basic_block(sd, tprefix, has_down)
            trunk_p[f"layer{s + 1}_{b}"] = p
            trunk_s[f"layer{s + 1}_{b}"] = st
    params["trunk"] = trunk_p
    state["trunk"] = trunk_s
    return params, state


def convert_avhubert_state_dict(sd, config):
    """fairseq ``av_hubert`` state dict → (params, state) for ``AVHubertModel``."""
    params = {}
    state = {}

    params["feature_extractor_audio"] = {
        "proj": {"w": _t(sd["feature_extractor_audio.proj.weight"]),
                 "b": np.asarray(sd["feature_extractor_audio.proj.bias"])}}
    resnet_p, resnet_s = convert_resnet(sd)
    params["feature_extractor_video"] = {
        "resnet": resnet_p,
        "proj": {"w": _t(sd["feature_extractor_video.proj.weight"]),
                 "b": np.asarray(sd["feature_extractor_video.proj.bias"])}}
    state["feature_extractor_video"] = {"resnet": resnet_s}

    params["layer_norm"] = {"scale": np.asarray(sd["layer_norm.weight"]),
                            "bias": np.asarray(sd["layer_norm.bias"])}
    if "post_extract_proj.weight" in sd:
        params["post_extract_proj"] = {"w": _t(sd["post_extract_proj.weight"]),
                                       "b": np.asarray(sd["post_extract_proj.bias"])}
    params["mask_emb"] = np.asarray(sd["mask_emb"]) if "mask_emb" in sd else np.zeros(
        (config.audio_feat_dim,), np.float32)

    pc = "encoder.pos_conv.0."
    if pc + "weight_g" in sd:
        g, v = np.asarray(sd[pc + "weight_g"]), np.asarray(sd[pc + "weight_v"])
    else:
        g = np.asarray(sd[pc + "parametrizations.weight.original0"])
        v = np.asarray(sd[pc + "parametrizations.weight.original1"])
    params["pos_conv"] = {
        "g": np.ascontiguousarray(np.transpose(g, (2, 1, 0))),
        "v": np.ascontiguousarray(np.transpose(v, (2, 1, 0))),
        "b": np.asarray(sd[pc + "bias"]),
    }

    params["encoder_ln"] = {"scale": np.asarray(sd["encoder.layer_norm.weight"]),
                            "bias": np.asarray(sd["encoder.layer_norm.bias"])}
    layers = {}
    for i in range(config.encoder_layers):
        pre = f"encoder.layers.{i}."
        layers[str(i)] = {
            "attn": {
                "wq": _t(sd[pre + "self_attn.q_proj.weight"]),
                "bq": np.asarray(sd[pre + "self_attn.q_proj.bias"]),
                "wk": _t(sd[pre + "self_attn.k_proj.weight"]),
                "bk": np.asarray(sd[pre + "self_attn.k_proj.bias"]),
                "wv": _t(sd[pre + "self_attn.v_proj.weight"]),
                "bv": np.asarray(sd[pre + "self_attn.v_proj.bias"]),
                "wo": _t(sd[pre + "self_attn.out_proj.weight"]),
                "bo": np.asarray(sd[pre + "self_attn.out_proj.bias"]),
            },
            "ln1": {"scale": np.asarray(sd[pre + "self_attn_layer_norm.weight"]),
                    "bias": np.asarray(sd[pre + "self_attn_layer_norm.bias"])},
            "ln2": {"scale": np.asarray(sd[pre + "final_layer_norm.weight"]),
                    "bias": np.asarray(sd[pre + "final_layer_norm.bias"])},
            "ffn1": {"w": _t(sd[pre + "fc1.weight"]),
                     "b": np.asarray(sd[pre + "fc1.bias"])},
            "ffn2": {"w": _t(sd[pre + "fc2.weight"]),
                     "b": np.asarray(sd[pre + "fc2.bias"])},
        }
    params["layers"] = layers
    return params, state


def load_avhubert(path, config):
    """Load + convert; returns (params, state)."""
    sd = load_fairseq_state_dict(path)
    return convert_avhubert_state_dict(sd, config)


def convert_wav2vec2_fairseq_state_dict(sd, config):
    """fairseq ``Wav2Vec2Model`` state dict → our ``Wav2Vec2Encoder`` params
    (reference loads these via fairseq runtime, ``fairseq_interface.py:26``
    FairseqWav2Vec2). fairseq naming: ``feature_extractor.conv_layers.N.0``
    convs (``.2``/``.2.1`` norms), ``post_extract_proj``, ``layer_norm`` (the
    feature LN), ``encoder.pos_conv.0`` weight-normed conv,
    ``encoder.layers.N.self_attn...`` transformer layers."""
    sd = {k.removeprefix("w2v_model."): np.asarray(v) for k, v in sd.items()}

    def get(key):
        return sd[key]

    params = {"feature_extractor": {}}
    for i in range(len(config.conv_dim)):
        pre = f"feature_extractor.conv_layers.{i}."
        layer = {"conv": {"w": np.transpose(get(pre + "0.weight"), (2, 1, 0))}}
        if pre + "0.bias" in sd:
            layer["conv"]["b"] = get(pre + "0.bias")
        if config.feat_extract_norm == "layer":
            layer["layer_norm"] = {"scale": get(pre + "2.weight"),
                                   "bias": get(pre + "2.bias")}
        elif i == 0:
            layer["group_norm"] = {"scale": get(pre + "2.weight"),
                                   "bias": get(pre + "2.bias")}
        params["feature_extractor"][str(i)] = layer

    params["feat_proj_ln"] = {"scale": get("layer_norm.weight"),
                              "bias": get("layer_norm.bias")}
    params["feat_proj"] = {"w": _t(get("post_extract_proj.weight")),
                           "b": get("post_extract_proj.bias")}
    pc = "encoder.pos_conv.0."
    g = get(pc + "weight_g") if pc + "weight_g" in sd else get(
        pc + "parametrizations.weight.original0")
    v = get(pc + "weight_v") if pc + "weight_v" in sd else get(
        pc + "parametrizations.weight.original1")
    params["pos_conv"] = {"g": np.transpose(g, (2, 1, 0)),
                          "v": np.transpose(v, (2, 1, 0)),
                          "b": get(pc + "bias")}
    params["encoder_ln"] = {"scale": get("encoder.layer_norm.weight"),
                            "bias": get("encoder.layer_norm.bias")}
    layers = {}
    for i in range(config.num_layers):
        pre = f"encoder.layers.{i}."
        layers[str(i)] = {
            "attn": {
                "wq": _t(get(pre + "self_attn.q_proj.weight")),
                "bq": get(pre + "self_attn.q_proj.bias"),
                "wk": _t(get(pre + "self_attn.k_proj.weight")),
                "bk": get(pre + "self_attn.k_proj.bias"),
                "wv": _t(get(pre + "self_attn.v_proj.weight")),
                "bv": get(pre + "self_attn.v_proj.bias"),
                "wo": _t(get(pre + "self_attn.out_proj.weight")),
                "bo": get(pre + "self_attn.out_proj.bias"),
            },
            "ln1": {"scale": get(pre + "self_attn_layer_norm.weight"),
                    "bias": get(pre + "self_attn_layer_norm.bias")},
            "ln2": {"scale": get(pre + "final_layer_norm.weight"),
                    "bias": get(pre + "final_layer_norm.bias")},
            "ffn1": {"w": _t(get(pre + "fc1.weight")),
                     "b": get(pre + "fc1.bias")},
            "ffn2": {"w": _t(get(pre + "fc2.weight")),
                     "b": get(pre + "fc2.bias")},
        }
    params["layers"] = layers
    return params


def convert_fairseq_seq2seq_decoder(sd, cfg):
    """``decoder.*`` keys of a fairseq ``hubert_asr`` seq2seq checkpoint →
    ``models.seq2seq_decoder.FairseqTransformerDecoder`` params.

    The reference decodes these checkpoints through its vendored fairseq
    ``TransformerDecoder`` (``speechbrain/lobes/models/decoder.py:38``);
    the key schema is fairseq's: ``embed_tokens.weight``,
    ``layers.N.{self_attn,encoder_attn}.{q,k,v,out}_proj.{weight,bias}``,
    ``layers.N.{self_attn,encoder_attn,final}_layer_norm``,
    ``layers.N.fc{1,2}``, optional ``embed_out`` / ``layer_norm`` /
    learned ``embed_positions.weight`` (the sinusoidal
    ``embed_positions._float_tensor`` buffer carries no information).
    """
    sd = {k.removeprefix("decoder."): np.asarray(v) for k, v in sd.items()
          if k.startswith("decoder.")}

    def attn(pre):
        return {"wq": _t(sd[pre + "q_proj.weight"]),
                "bq": sd[pre + "q_proj.bias"],
                "wk": _t(sd[pre + "k_proj.weight"]),
                "bk": sd[pre + "k_proj.bias"],
                "wv": _t(sd[pre + "v_proj.weight"]),
                "bv": sd[pre + "v_proj.bias"],
                "wo": _t(sd[pre + "out_proj.weight"]),
                "bo": sd[pre + "out_proj.bias"]}

    def ln(pre):
        return {"scale": sd[pre + "weight"], "bias": sd[pre + "bias"]}

    params = {"embed_tokens": {"table": sd["embed_tokens.weight"]},
              "layers": {}}
    for i in range(cfg.num_layers):
        pre = f"layers.{i}."
        params["layers"][str(i)] = {
            "self_attn": attn(pre + "self_attn."),
            "encoder_attn": attn(pre + "encoder_attn."),
            "ln_self": ln(pre + "self_attn_layer_norm."),
            "ln_cross": ln(pre + "encoder_attn_layer_norm."),
            "ln_final": ln(pre + "final_layer_norm."),
            "fc1": {"w": _t(sd[pre + "fc1.weight"]),
                    "b": sd[pre + "fc1.bias"]},
            "fc2": {"w": _t(sd[pre + "fc2.weight"]),
                    "b": sd[pre + "fc2.bias"]},
        }
    if cfg.learned_pos:
        params["embed_positions"] = {"table": sd["embed_positions.weight"]}
    if not cfg.share_input_output_embed:
        params["embed_out"] = sd["embed_out"]
    if cfg.normalize_before:
        params["final_ln"] = ln("layer_norm.")
    return params


def convert_fairseq_avhubert_asr(sd, encoder_config, decoder_cfg):
    """Full ``hubert_asr``-style seq2seq state dict → (encoder params,
    encoder state, decoder params).

    fairseq's AV-HuBERT ASR model wraps the pretrained encoder as
    ``encoder.w2v_model.*`` and the seq2seq decoder as ``decoder.*``
    (the reference loads it through the fairseq task registry;
    here it is a plain state-dict mapping like the other six families).
    """
    enc_sd = {k.removeprefix("encoder.w2v_model."): v for k, v in sd.items()
              if k.startswith("encoder.w2v_model.")}
    enc_params, enc_state = convert_avhubert_state_dict(enc_sd,
                                                        encoder_config)
    dec_params = convert_fairseq_seq2seq_decoder(sd, decoder_cfg)
    return enc_params, enc_state, dec_params
