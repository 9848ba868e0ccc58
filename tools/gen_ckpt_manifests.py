#!/usr/bin/env python3
"""Generate full-size checkpoint key/shape manifests (fixtures for
``tests/test_ckpt_manifests.py``).

The reference fine-tunes from real pretrained checkpoints —
``facebook/wav2vec2-large-lv60`` (``MIR_ST500/huggingface_interface.py:179``)
and fairseq AV-HuBERT (``N20EMv2/video_only/fairseq_interface.py:26``) —
but this zero-egress image has no weights. The next best guarantee: freeze
the EXACT key/shape lists those checkpoints carry and test that our
converters consume every key and produce every param our models expect.

HF families are instantiated at full size on the meta device (zero memory,
real naming/shapes for the published architecture). The AV-HuBERT manifest
uses the reference's own vendored torch model code for the visual trunk
(``N20EMv2/video_only/resnet.py``) plus the module layout read from
``hubert.py:311-408`` (SubModel projections, concat fusion 2048→1024
post_extract_proj, 104-dim input mask_emb, fairseq transformer naming).

Run: python tools/gen_ckpt_manifests.py  →  tests/fixtures/ckpt_manifests.json
"""
import importlib.util
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
OUT_PATH = os.path.join(REPO_ROOT, "tests", "fixtures",
                        "ckpt_manifests.json")


def hf_families():
    from transformers import (
        Wav2Vec2Config, Wav2Vec2Model, HubertConfig, HubertModel,
        WavLMConfig, WavLMModel, Data2VecAudioConfig, Data2VecAudioModel)

    large = dict(hidden_size=1024, num_hidden_layers=24,
                 num_attention_heads=16, intermediate_size=4096)
    large_ln = dict(large, feat_extract_norm="layer", conv_bias=True,
                    do_stable_layer_norm=True)
    return {
        # HF defaults ARE the base architecture
        "wav2vec2-base": (Wav2Vec2Model, Wav2Vec2Config()),
        "wav2vec2-large-lv60": (Wav2Vec2Model, Wav2Vec2Config(**large_ln)),
        "hubert-large-ll60k": (HubertModel, HubertConfig(**large_ln)),
        "wavlm-large": (WavLMModel, WavLMConfig(
            **large, feat_extract_norm="layer", conv_bias=False,
            do_stable_layer_norm=True, num_buckets=320,
            max_bucket_distance=800)),
        "data2vec-audio-large-960h": (Data2VecAudioModel,
                                      Data2VecAudioConfig(**large)),
    }


def hf_manifest(model_cls, config):
    from accelerate import init_empty_weights

    with init_empty_weights():
        model = model_cls(config)
    return {k: list(v.shape) for k, v in model.state_dict().items()}


def avhubert_large_manifest():
    """fairseq ``av_hubert`` AV-HuBERT Large fine-tune checkpoint keys."""
    import torch

    spec = importlib.util.spec_from_file_location(
        "_ref_resnet_gen", "/root/reference/N20EMv2/video_only/resnet.py")
    ref_resnet = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_resnet)
    with torch.device("meta"):
        resnet = ref_resnet.ResEncoder(relu_type="prelu", weights=None)

    d, ffn, layers = 1024, 4096, 24
    audio_f, video_f = 104, 512
    embed = 2 * d  # concat fusion (hubert.py:350-353)
    m = {}
    for k, v in resnet.state_dict().items():
        m[f"feature_extractor_video.resnet.{k}"] = list(v.shape)
    m["feature_extractor_audio.proj.weight"] = [d, audio_f]
    m["feature_extractor_audio.proj.bias"] = [d]
    m["feature_extractor_video.proj.weight"] = [d, video_f]
    m["feature_extractor_video.proj.bias"] = [d]
    m["post_extract_proj.weight"] = [d, embed]
    m["post_extract_proj.bias"] = [d]
    m["layer_norm.weight"] = [embed]
    m["layer_norm.bias"] = [embed]
    m["mask_emb"] = [audio_f]  # input masking (hubert.py:389-390)
    m["encoder.pos_conv.0.bias"] = [d]
    m["encoder.pos_conv.0.weight_g"] = [1, 1, 128]
    m["encoder.pos_conv.0.weight_v"] = [d, d // 16, 128]
    m["encoder.layer_norm.weight"] = [d]
    m["encoder.layer_norm.bias"] = [d]
    for i in range(layers):
        pre = f"encoder.layers.{i}."
        for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
            m[pre + f"self_attn.{p}.weight"] = [d, d]
            m[pre + f"self_attn.{p}.bias"] = [d]
        m[pre + "self_attn_layer_norm.weight"] = [d]
        m[pre + "self_attn_layer_norm.bias"] = [d]
        m[pre + "fc1.weight"] = [ffn, d]
        m[pre + "fc1.bias"] = [ffn]
        m[pre + "fc2.weight"] = [d, ffn]
        m[pre + "fc2.bias"] = [d]
        m[pre + "final_layer_norm.weight"] = [d]
        m[pre + "final_layer_norm.bias"] = [d]
    # pretraining-only keys present in public checkpoints (dropped at load,
    # like the reference's strict=False load)
    m["final_proj.weight"] = [256, d]
    m["final_proj.bias"] = [256]
    m["label_embs_concat"] = [2004, 256]
    return m


def avhubert_asr_seq2seq_manifest():
    """fairseq ``av_hubert_seq2seq`` ASR fine-tune checkpoint keys
    (``N20EMv2/video_only/hubert_asr.py:406``): the pretrained encoder
    wrapped as ``encoder.w2v_model.*`` (``remove_pretraining_modules()``
    drops final_proj/label_embs; ``mask_emb`` stays — it is a module
    param), plus the fairseq ``decoder.*`` TransformerDecoder. Decoder
    sized to the large encoder (1024 embed — fairseq cross-attention
    requires decoder dim == encoder dim here, ``decoder.py:94-110``),
    unigram-1000 target vocab; the converter is config-driven, so any
    published size maps the same way."""
    m = {}
    for k, v in avhubert_large_manifest().items():
        if k.startswith(("final_proj.", "label_embs_concat")):
            continue
        m[f"encoder.w2v_model.{k}"] = v
    d, ffn, layers, vocab = 1024, 4096, 6, 1000
    m["decoder.embed_tokens.weight"] = [vocab, d]
    m["decoder.embed_out"] = [vocab, d]
    m["decoder.embed_positions._float_tensor"] = [1]  # sinusoidal buffer
    for i in range(layers):
        pre = f"decoder.layers.{i}."
        for a in ("self_attn", "encoder_attn"):
            for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
                m[pre + f"{a}.{p}.weight"] = [d, d]
                m[pre + f"{a}.{p}.bias"] = [d]
            m[pre + f"{a}_layer_norm.weight"] = [d]
            m[pre + f"{a}_layer_norm.bias"] = [d]
        m[pre + "fc1.weight"] = [ffn, d]
        m[pre + "fc1.bias"] = [ffn]
        m[pre + "fc2.weight"] = [d, ffn]
        m[pre + "fc2.bias"] = [d]
        m[pre + "final_layer_norm.weight"] = [d]
        m[pre + "final_layer_norm.bias"] = [d]
    return m


def main():
    manifests = {}
    for name, (cls, cfg) in hf_families().items():
        manifests[name] = hf_manifest(cls, cfg)
        print(f"{name}: {len(manifests[name])} keys")
    if os.path.isdir("/root/reference"):
        manifests["avhubert-large"] = avhubert_large_manifest()
        print(f"avhubert-large: {len(manifests['avhubert-large'])} keys")
        manifests["avhubert-asr-seq2seq"] = avhubert_asr_seq2seq_manifest()
        print(f"avhubert-asr-seq2seq: "
              f"{len(manifests['avhubert-asr-seq2seq'])} keys")
    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    with open(OUT_PATH, "w") as f:
        json.dump(manifests, f, indent=1, sort_keys=True)
    print("wrote", OUT_PATH)


if __name__ == "__main__":
    main()
