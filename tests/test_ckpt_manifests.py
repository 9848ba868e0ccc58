"""Full-size checkpoint conversion guarantees — offline.

The reference fine-tunes real pretrained checkpoints
(``facebook/wav2vec2-large-lv60``, ``MIR_ST500/huggingface_interface.py:179``;
fairseq AV-HuBERT, ``N20EMv2/video_only/fairseq_interface.py:26``). No
weights ship in this image, so these tests pin the frozen key/shape
manifests (``tests/fixtures/ckpt_manifests.json``, built by
``tools/gen_ckpt_manifests.py``) and prove, for every family the bridge
claims:

1. the manifest still matches what the full-size architecture produces
   (drift guard, HF families — instantiated on the meta device);
2. ``convert_hf``/``convert_fairseq`` CONSUME every checkpoint key except
   the documented load-time-dropped ones (the reference loads with
   ``strict=False``), under both the classic ``weight_g/weight_v`` naming
   real checkpoint files use and the parametrize-style naming newer torch
   emits;
3. the converted tree has EXACTLY the structure+shapes our JAX model's
   ``init`` produces (via ``jax.eval_shape`` — no full-size compute).

Together: real checkpoints cannot fail to convert for any reason a test
could catch offline — including the weight-normed grouped pos-conv.
"""
import json
import os

import numpy as np
import pytest

from tests.conftest import REPO_ROOT, reference_available

MANIFESTS = os.path.join(REPO_ROOT, "tests", "fixtures",
                         "ckpt_manifests.json")

# keys a real checkpoint carries that conversion intentionally drops
# (mirrors the reference's strict=False load_state_dict)
IGNORABLE = {
    "wav2vec2-base": {"masked_spec_embed"},
    "wav2vec2-large-lv60": {"masked_spec_embed"},
    "hubert-large-ll60k": {"masked_spec_embed"},
    "wavlm-large": {"masked_spec_embed"},
    "data2vec-audio-large-960h": {"masked_spec_embed"},
    # pretraining head + cluster embeddings, and BatchNorm batch counters
    "avhubert-large": {"final_proj.weight", "final_proj.bias",
                       "label_embs_concat"},
}


def load_manifest(family):
    with open(MANIFESTS) as f:
        return json.load(f)[family]


def tagged_sd(manifest):
    """Each key's array is filled with a unique constant, so consumption can
    be recovered from the converted tree's values (the converters only
    transpose/copy — they never mix two tensors)."""
    sd, tag_to_key = {}, {}
    for i, (k, shape) in enumerate(sorted(manifest.items()), start=1):
        sd[k] = np.full(shape, float(i), np.float32)
        tag_to_key[float(i)] = k
    return sd, tag_to_key


def consumed_keys(tree, tag_to_key):
    import jax

    seen = set()
    for leaf in jax.tree_util.tree_leaves(tree):
        for v in np.unique(np.asarray(leaf)):
            key = tag_to_key.get(float(v))
            assert key is not None, f"leaf value {v} maps to no input key"
            seen.add(key)
    return seen


def to_weight_norm_naming(manifest):
    """parametrize-style → the classic g/v naming real checkpoint files
    (safetensors/bin on the hub) actually carry."""
    out = {}
    for k, v in manifest.items():
        k = k.replace("parametrizations.weight.original0", "weight_g")
        k = k.replace("parametrizations.weight.original1", "weight_v")
        out[k] = v
    return out


def my_config_for(family):
    from svt_speechbrain_tpu.models.wav2vec2 import Wav2Vec2Config

    return {
        "wav2vec2-base": Wav2Vec2Config.base,
        "wav2vec2-large-lv60": Wav2Vec2Config.large_lv60,
        "hubert-large-ll60k": Wav2Vec2Config.hubert_large,
        "wavlm-large": Wav2Vec2Config.wavlm_large,
        "data2vec-audio-large-960h": Wav2Vec2Config.data2vec_audio_large,
    }[family]()


def tree_shapes(tree):
    import jax

    return jax.tree_util.tree_map(
        lambda leaf: tuple(leaf.shape), tree)


HF_FAMILIES = ["wav2vec2-base", "wav2vec2-large-lv60", "hubert-large-ll60k",
               "wavlm-large", "data2vec-audio-large-960h"]


@pytest.mark.parametrize("family", HF_FAMILIES)
def test_hf_manifest_matches_live_architecture(family):
    """Drift guard: rebuilding the full-size architecture reproduces the
    frozen manifest exactly."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_manifests", os.path.join(REPO_ROOT, "tools",
                                      "gen_ckpt_manifests.py"))
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    cls, cfg = gen.hf_families()[family]
    live = gen.hf_manifest(cls, cfg)
    frozen = load_manifest(family)
    assert live == frozen, (
        f"{family}: architecture drifted from frozen manifest "
        f"(regen with tools/gen_ckpt_manifests.py and review)")


@pytest.mark.parametrize("naming", ["checkpoint-file", "parametrize"])
@pytest.mark.parametrize("family", HF_FAMILIES)
def test_hf_conversion_covers_all_keys_and_shapes(family, naming):
    import jax
    from svt_speechbrain_tpu.models.convert_hf import (
        convert_wav2vec2_state_dict)
    from svt_speechbrain_tpu.models.wav2vec2 import Wav2Vec2Encoder

    manifest = load_manifest(family)
    if naming == "checkpoint-file":
        manifest = to_weight_norm_naming(manifest)
    cfg = my_config_for(family)
    sd, tags = tagged_sd(manifest)
    params = convert_wav2vec2_state_dict(sd, cfg)

    unconsumed = set(manifest) - consumed_keys(params, tags)
    assert unconsumed == IGNORABLE[family], (
        f"{family}: converter silently dropped {sorted(unconsumed - IGNORABLE[family])}")

    model = Wav2Vec2Encoder(cfg)
    want = tree_shapes(jax.eval_shape(model.init, jax.random.PRNGKey(0)))
    got = tree_shapes(params)
    assert got == want, f"{family}: converted tree != model.init tree"


@pytest.mark.skipif(not reference_available(),
                    reason="avhubert manifest needs the reference resnet")
def test_avhubert_conversion_covers_all_keys_and_shapes():
    import jax
    from svt_speechbrain_tpu.models.avhubert import (
        AVHubertConfig, AVHubertModel)
    from svt_speechbrain_tpu.models.convert_fairseq import (
        convert_avhubert_state_dict)

    manifest = load_manifest("avhubert-large")
    cfg = AVHubertConfig.large()
    sd, tags = tagged_sd(manifest)
    params, state = convert_avhubert_state_dict(sd, cfg)

    unconsumed = set(manifest) - consumed_keys((params, state), tags)
    # BatchNorm num_batches_tracked counters have no JAX counterpart
    unconsumed = {k for k in unconsumed
                  if not k.endswith("num_batches_tracked")}
    assert unconsumed == IGNORABLE["avhubert-large"], (
        f"avhubert: converter silently dropped "
        f"{sorted(unconsumed - IGNORABLE['avhubert-large'])}")

    model = AVHubertModel(cfg)
    want_p = tree_shapes(jax.eval_shape(model.init, jax.random.PRNGKey(0)))
    want_s = tree_shapes(jax.eval_shape(model.init_state))
    assert tree_shapes(params) == want_p, "params tree != model.init tree"
    assert tree_shapes(state) == want_s, "state tree != model.init_state tree"


@pytest.mark.skipif(not reference_available(),
                    reason="avhubert manifest needs the reference resnet")
def test_avhubert_asr_seq2seq_conversion_covers_all_keys_and_shapes():
    """The seq2seq ASR family: encoder.w2v_model.* + decoder.* both consumed
    and both converted trees match the models' init trees exactly."""
    import jax
    from svt_speechbrain_tpu.models.avhubert import (
        AVHubertConfig, AVHubertModel)
    from svt_speechbrain_tpu.models.convert_fairseq import (
        convert_fairseq_avhubert_asr)
    from svt_speechbrain_tpu.models.seq2seq_decoder import (
        FairseqDecoderConfig, FairseqTransformerDecoder)

    manifest = load_manifest("avhubert-asr-seq2seq")
    enc_cfg = AVHubertConfig.large()
    dec_cfg = FairseqDecoderConfig(
        vocab_size=1000, embed_dim=1024, ffn_dim=4096, num_layers=6,
        num_heads=8, normalize_before=False, no_scale_embedding=True)
    sd, tags = tagged_sd(manifest)
    enc_params, enc_state, dec_params = convert_fairseq_avhubert_asr(
        sd, enc_cfg, dec_cfg)

    unconsumed = set(manifest) - consumed_keys(
        (enc_params, enc_state, dec_params), tags)
    unconsumed = {k for k in unconsumed
                  if not k.endswith("num_batches_tracked")}
    # the sinusoidal position buffer carries no information
    assert unconsumed == {"decoder.embed_positions._float_tensor"}, (
        f"seq2seq: converter silently dropped {sorted(unconsumed)}")

    enc_model = AVHubertModel(enc_cfg)
    assert tree_shapes(enc_params) == tree_shapes(
        jax.eval_shape(enc_model.init, jax.random.PRNGKey(0)))
    assert tree_shapes(enc_state) == tree_shapes(
        jax.eval_shape(enc_model.init_state))
    dec_model = FairseqTransformerDecoder(dec_cfg)
    assert tree_shapes(dec_params) == tree_shapes(
        jax.eval_shape(dec_model.init, jax.random.PRNGKey(0)))
