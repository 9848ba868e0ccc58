"""wav2vec2 encoder: numeric parity vs HuggingFace ``transformers`` (torch CPU)
on a small random-initialized model, plus frame-rate arithmetic."""
import numpy as np
import pytest

from svt_speechbrain_tpu.models.wav2vec2 import (
    Wav2Vec2Config, Wav2Vec2Encoder, HuggingFaceWav2Vec2,
)
from svt_speechbrain_tpu.models.convert_hf import convert_wav2vec2_state_dict


def small_hf_config(stable_layer_norm):
    from transformers import Wav2Vec2Config as HFConfig

    return HFConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=(16, 16, 16),
        conv_kernel=(10, 3, 2),
        conv_stride=(5, 2, 2),
        feat_extract_norm="layer" if stable_layer_norm else "group",
        conv_bias=stable_layer_norm,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=stable_layer_norm,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
    )


def to_my_config(hf):
    return Wav2Vec2Config(
        hidden_size=hf.hidden_size,
        num_layers=hf.num_hidden_layers,
        num_heads=hf.num_attention_heads,
        ffn_size=hf.intermediate_size,
        conv_dim=tuple(hf.conv_dim),
        conv_kernel=tuple(hf.conv_kernel),
        conv_stride=tuple(hf.conv_stride),
        feat_extract_norm=hf.feat_extract_norm,
        conv_bias=hf.conv_bias,
        num_conv_pos_embeddings=hf.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=hf.num_conv_pos_embedding_groups,
        do_stable_layer_norm=hf.do_stable_layer_norm,
    )


@pytest.mark.parametrize("stable_layer_norm", [True, False])
def test_forward_matches_transformers(stable_layer_norm):
    import torch
    from transformers import Wav2Vec2Model

    torch.manual_seed(0)
    hf_cfg = small_hf_config(stable_layer_norm)
    hf_model = Wav2Vec2Model(hf_cfg).eval()

    wav = np.random.default_rng(0).normal(size=(2, 4000)).astype(np.float32)
    with torch.no_grad():
        expected = hf_model(torch.tensor(wav)).last_hidden_state.numpy()

    cfg = to_my_config(hf_cfg)
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    params = convert_wav2vec2_state_dict(sd, cfg)
    model = Wav2Vec2Encoder(cfg)
    got = np.asarray(model(params, wav))

    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-3)


def test_output_length_is_49_8hz():
    cfg = Wav2Vec2Config.large_lv60()
    # 5 s at 16 kHz → ~249 frames (49.8 Hz)
    t = cfg.output_length(5 * 16000)
    assert t == 249
    # stride 320 overall
    assert cfg.output_length(16000 * 10) - cfg.output_length(16000 * 10 - 320) == 1


def test_bridge_normalization_modes():
    """The SB bridge's whole-tensor layer norms (huggingface_interface.py:288,296)."""
    import jax

    cfg = Wav2Vec2Config(hidden_size=32, num_layers=1, num_heads=4, ffn_size=64,
                         conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2),
                         num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4)
    bridge = HuggingFaceWav2Vec2(cfg, output_norm=True, normalize_wav=True)
    params = bridge.init(jax.random.PRNGKey(0))
    wav = np.random.default_rng(1).normal(size=(2, 2000)).astype(np.float32) * 7 + 3
    out = np.asarray(bridge(params, wav))
    # output_norm makes the whole output zero-mean/unit-var
    assert abs(out.mean()) < 1e-3
    assert abs(out.std() - 1.0) < 1e-2


def test_freeze_stops_gradients():
    import jax
    import jax.numpy as jnp

    cfg = Wav2Vec2Config(hidden_size=32, num_layers=1, num_heads=4, ffn_size=64,
                         conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2),
                         num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4)
    bridge = HuggingFaceWav2Vec2(cfg, freeze=True)
    params = bridge.init(jax.random.PRNGKey(0))
    wav = jnp.ones((1, 2000))

    grads = jax.grad(lambda p: jnp.sum(bridge(p, wav)))(params)
    assert all(float(jnp.abs(g).max()) == 0.0 for g in jax.tree_util.tree_leaves(grads))


import pytest


@pytest.mark.parametrize("norm_mode", ["layer", "group"])
def test_exact_masking_is_padding_invariant(norm_mode):
    """With wav_lens, outputs on real frames must be identical no matter how
    much padding follows — the property that makes the padded eval bit-equal
    to the torch reference's unpadded batch-1 eval. Covers both the large
    (per-frame LayerNorm extractor, pre-LN) and base (time-dependent
    GroupNorm extractor, post-LN) architectures."""
    import jax
    import jax.numpy as jnp

    cfg = Wav2Vec2Config(hidden_size=32, num_layers=2, num_heads=4, ffn_size=64,
                         conv_dim=(16,) * 7, num_conv_pos_embeddings=16,
                         num_conv_pos_embedding_groups=4,
                         feat_extract_norm=norm_mode,
                         conv_bias=(norm_mode == "layer"),
                         do_stable_layer_norm=(norm_mode == "layer"))
    bridge = HuggingFaceWav2Vec2(config=cfg, output_norm=True,
                                 normalize_wav=(norm_mode == "layer"))
    params = bridge.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    true_len = 7000
    wav = rng.normal(size=true_len).astype(np.float32)
    frames = cfg.output_length(true_len)

    outs = []
    for padded_len in (8000, 12000, 16000):
        buf = np.zeros(padded_len, np.float32)
        buf[:true_len] = wav
        out = bridge(params, jnp.asarray(buf[None]),
                     wav_lens=jnp.asarray([true_len / padded_len]))
        outs.append(np.asarray(out)[0, :frames])
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-5)
    np.testing.assert_allclose(outs[0], outs[2], atol=2e-5)


def _small_kwargs():
    return dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                intermediate_size=64, conv_dim=(16, 16, 16),
                conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
                num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
                hidden_dropout=0.0, attention_dropout=0.0,
                activation_dropout=0.0, feat_proj_dropout=0.0, layerdrop=0.0)


@pytest.mark.parametrize("family", ["hubert", "data2vec", "wavlm"])
def test_forward_matches_transformers_variants(family):
    """The bridge's other name-sniffed SSL families (reference
    ``huggingface_interface.py:217`` loads wav2vec2/HuBERT/data2vec/WavLM):
    numeric parity vs the HF torch implementations."""
    import dataclasses

    import torch

    from svt_speechbrain_tpu.models.wav2vec2 import Wav2Vec2Encoder

    torch.manual_seed(0)
    kw = _small_kwargs()
    if family == "hubert":
        from transformers import HubertConfig, HubertModel

        hf_cfg = HubertConfig(feat_extract_norm="group", conv_bias=False,
                              do_stable_layer_norm=False,
                              feat_proj_layer_norm=False, **kw)
        hf_model = HubertModel(hf_cfg).eval()
        cfg = dataclasses.replace(
            Wav2Vec2Config.hubert_base(), feat_proj_layer_norm=False)
    elif family == "data2vec":
        from transformers import Data2VecAudioConfig, Data2VecAudioModel

        kw["num_conv_pos_embeddings"] = 2  # depth for data2vec
        hf_cfg = Data2VecAudioConfig(conv_pos_kernel_size=5, **kw)
        hf_model = Data2VecAudioModel(hf_cfg).eval()
        cfg = dataclasses.replace(
            Wav2Vec2Config.data2vec_audio_base(),
            pos_conv_depth=2, pos_conv_kernel=5)
    else:
        from transformers import WavLMConfig, WavLMModel

        hf_cfg = WavLMConfig(feat_extract_norm="group", conv_bias=False,
                             do_stable_layer_norm=False, num_buckets=32,
                             max_bucket_distance=64, **kw)
        hf_model = WavLMModel(hf_cfg).eval()
        cfg = dataclasses.replace(
            Wav2Vec2Config.wavlm_base(), num_buckets=32,
            max_bucket_distance=64)

    cfg = dataclasses.replace(
        cfg, hidden_size=32, num_layers=2, num_heads=4, ffn_size=64,
        conv_dim=(16, 16, 16), conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4)

    wav = np.random.default_rng(0).normal(size=(2, 4000)).astype(np.float32)
    with torch.no_grad():
        expected = hf_model(torch.tensor(wav)).last_hidden_state.numpy()

    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    params = convert_wav2vec2_state_dict(sd, cfg)
    model = Wav2Vec2Encoder(cfg)
    got = np.asarray(model(params, wav))

    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=3e-4, rtol=1e-3)


def test_bridge_name_sniffing():
    """Source-name sniffing picks the right architecture family, like the
    reference bridge's ``_check_model_source``."""
    cases = {
        "facebook/hubert-base-ls960": ("group", False, "weight_norm", False),
        "facebook/hubert-large-ll60k": ("layer", True, "weight_norm", False),
        "facebook/data2vec-audio-base-960h": ("layer", False, "stacked", False),
        "microsoft/wavlm-base-plus": ("group", False, "weight_norm", True),
        "microsoft/wavlm-large": ("layer", True, "weight_norm", True),
        "facebook/wav2vec2-large-lv60": ("layer", True, "weight_norm", False),
    }
    for name, (norm, stable, pos, rel) in cases.items():
        cfg = HuggingFaceWav2Vec2(source=name).config
        assert cfg.feat_extract_norm == norm, name
        assert cfg.do_stable_layer_norm == stable, name
        assert cfg.pos_conv_type == pos, name
        assert cfg.rel_pos_bias == rel, name


def test_remat_frontend_matches_plain():
    """remat_frontend recomputes the conv extractor in backward (whole-song
    training memory) without changing values or gradients."""
    import jax
    import jax.numpy as jnp

    cfg = dict(hidden_size=32, num_layers=2, num_heads=4, ffn_size=64,
               conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2),
               num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4)
    a = HuggingFaceWav2Vec2(Wav2Vec2Config(**cfg))
    b = HuggingFaceWav2Vec2(Wav2Vec2Config(**cfg, remat_frontend=True,
                                           remat=True))
    params = a.init(jax.random.PRNGKey(0))
    wav = jnp.asarray(np.random.default_rng(2).normal(size=(2, 3000)),
                      jnp.float32)

    fa = np.asarray(a(params, wav))
    fb = np.asarray(b(params, wav))
    np.testing.assert_allclose(fb, fa, atol=1e-6)

    ga = jax.grad(lambda p: jnp.sum(a(p, wav) ** 2))(params)
    gb = jax.grad(lambda p: jnp.sum(b(p, wav) ** 2))(params)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=1e-5, rtol=1e-4), ga, gb)
