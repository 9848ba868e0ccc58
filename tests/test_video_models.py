"""Visual-frontend parity vs the reference torch implementation, AV-HuBERT
behaviour, and RCA fusion properties."""
import importlib.util
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import reference_available


@pytest.mark.skipif(not reference_available(), reason="reference not present")
def test_resencoder_matches_reference_torch():
    """Random-initialized reference ResEncoder → converted weights → our
    channel-last ResEncoder must match numerically (eval mode)."""
    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_resnet", "/root/reference/N20EMv2/video_only/resnet.py")
    ref_resnet = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_resnet)

    torch.manual_seed(0)
    ref = ref_resnet.ResEncoder(relu_type="prelu", weights=None).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    # reference names: frontend3D.* / trunk.*; our converter expects the
    # fairseq prefix — adapt
    sd = {f"feature_extractor_video.resnet.{k}": v for k, v in sd.items()}
    from svt_speechbrain_tpu.models.convert_fairseq import convert_resnet
    from svt_speechbrain_tpu.models.resnet import ResEncoder

    params, state = convert_resnet(sd)
    mine = ResEncoder(relu_type="prelu")

    video = np.random.default_rng(0).normal(size=(2, 6, 88, 88)).astype(np.float32)
    with torch.no_grad():
        # reference input (B, C, T, H, W); output (B, C=512, T)
        expected = ref(torch.tensor(video)[:, None]).numpy().transpose(0, 2, 1)
    got, _ = mine(params, state, jnp.asarray(video[..., None]), train=False)
    got = np.asarray(got)
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=5e-4, rtol=1e-3)


@pytest.fixture(scope="module")
def tiny_avhubert():
    from svt_speechbrain_tpu.models.avhubert import AVHubertConfig, AVHubertModel

    cfg = AVHubertConfig(encoder_layers=2, encoder_embed_dim=32,
                         encoder_ffn_embed_dim=64, encoder_attention_heads=4,
                         audio_feat_dim=8, conv_pos=16, conv_pos_groups=4)
    model = AVHubertModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    state = model.init_state()
    return model, params, state


def test_avhubert_video_only_forward(tiny_avhubert):
    model, params, state = tiny_avhubert
    video = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 88, 88, 1)),
                        dtype=jnp.float32)
    feats, new_state = model.extract_finetune(
        params, state, {"video": video, "audio": None}, train=False)
    assert feats.shape == (2, 5, 32)
    # eval keeps running stats unchanged
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(new_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_avhubert_audio_only_and_both(tiny_avhubert):
    model, params, state = tiny_avhubert
    audio = jnp.asarray(np.random.default_rng(1).normal(size=(2, 5, 8)), jnp.float32)
    feats_a, _ = model.extract_finetune(params, state, {"audio": audio, "video": None})
    assert feats_a.shape == (2, 5, 32)
    video = jnp.asarray(np.random.default_rng(2).normal(size=(2, 5, 88, 88, 1)), jnp.float32)
    feats_av, _ = model.extract_finetune(params, state, {"audio": audio, "video": video})
    assert feats_av.shape == (2, 5, 32)
    assert np.abs(np.asarray(feats_a) - np.asarray(feats_av)).max() > 1e-5


def test_avhubert_batchnorm_updates_in_train(tiny_avhubert):
    model, params, state = tiny_avhubert
    video = jnp.asarray(np.random.default_rng(3).normal(size=(2, 5, 88, 88, 1)), jnp.float32)
    _, new_state = model.extract_finetune(params, state, {"video": video, "audio": None},
                                          train=True)
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree_util.tree_leaves(state),
                             jax.tree_util.tree_leaves(new_state))]
    assert max(diffs) > 0


def test_rca_shared_weight_equivalence():
    """The batched-queries trick must equal running the shared MHA twice."""
    from svt_speechbrain_tpu.models.fusion import RCALayer
    from svt_speechbrain_tpu.nnet.attention import MultiheadAttention

    layer = RCALayer(d_ffn=32, nhead=4, d_model=16)
    params = layer.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    kv = jnp.asarray(rng.normal(size=(2, 7, 16)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(2, 7, 16)), jnp.float32)
    out = layer(params, kv, q)

    # manual: self-attn + cross-attn with the SAME weights, α-residual + FFN
    mha = MultiheadAttention(4, 16)
    self_out, _ = mha(params["self_att"], kv, kv, kv)
    cross_out, _ = mha(params["self_att"], q, kv, kv)
    src = kv + 0.5 * self_out + 0.5 * cross_out
    from svt_speechbrain_tpu.nnet.normalization import LayerNorm
    from svt_speechbrain_tpu.nnet.attention import PositionalwiseFeedForward

    ln1 = LayerNorm(16, eps=1e-6)
    src = ln1(params["norm1"], src)
    ffn = PositionalwiseFeedForward(32, 16)
    expected = src + ffn(params["pos_ffn"], src)
    expected = LayerNorm(16, eps=1e-6)(params["norm2"], expected)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_fusion_rca_alignment():
    from svt_speechbrain_tpu.models.fusion import FusionRCA

    fusion = FusionRCA(d_model=16, nhead=4, d_ffn=32)
    params = fusion.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(size=(1, 50, 16)), jnp.float32)
    # video longer → truncated; video shorter → zero-padded; both must work
    for v_frames in (53, 47):
        video = jnp.asarray(rng.normal(size=(1, v_frames, 16)), jnp.float32)
        out = fusion(params, audio, video)
        assert out.shape == (1, 50, 16)


def test_avhubert_pretrain_learns():
    import optax

    from svt_speechbrain_tpu.models.avhubert import AVHubertConfig, AVHubertPretrain

    cfg = AVHubertConfig(encoder_layers=1, encoder_embed_dim=32,
                         encoder_ffn_embed_dim=64, encoder_attention_heads=4,
                         audio_feat_dim=8, conv_pos=16, conv_pos_groups=4)
    model = AVHubertPretrain(cfg, num_classes=10, final_dim=16)
    params = model.init(jax.random.PRNGKey(0))
    state = model.init_state()
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(size=(2, 20, 8)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, 10, (2, 20)))
    mask = jnp.asarray(model.sample_masks(2, 20, rng))
    assert bool(mask.sum() > 0)

    tx = optax.adam(5e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            loss, aux, _ = model(p, state, {"audio": audio, "video": None},
                                 targets, mask)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(40):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.5  # memorizes the cluster targets
