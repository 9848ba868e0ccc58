"""Golden parity of the dual-path (SepFormer) mask network vs the reference
``speechbrain/lobes/models/dual_path.py`` — converted weights → equal
masks through the whole stack: global norm, bottleneck, scaled global
positional encoding, 50%-overlap segmentation, dual computation blocks
(intra/inter transformers + linears + norms + skip), PReLU, speaker
expansion, overlap-add, tanh×sigmoid gate, end 1x1, ReLU.
"""
import importlib

import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import import_reference_speechbrain, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")


def _lin(torch_linear):
    p = {"w": torch_linear.weight.detach().numpy().T.copy()}
    if torch_linear.bias is not None:
        p["b"] = torch_linear.bias.detach().numpy().copy()
    return p


def _sb_lin(sb_linear):
    return _lin(sb_linear.w)


def _conv1x1(conv):
    p = {"w": conv.weight.detach().numpy()[:, :, 0].T.copy()}
    if conv.bias is not None:
        p["b"] = conv.bias.detach().numpy().copy()
    return p


def _gn(groupnorm):
    return {"scale": groupnorm.weight.detach().numpy().copy(),
            "bias": groupnorm.bias.detach().numpy().copy()}


def _mha(mha, d):
    w = mha.in_proj_weight.detach().numpy()
    b = mha.in_proj_bias.detach().numpy()
    return {"wq": w[:d].T.copy(), "bq": b[:d].copy(),
            "wk": w[d:2 * d].T.copy(), "bk": b[d:2 * d].copy(),
            "wv": w[2 * d:].T.copy(), "bv": b[2 * d:].copy(),
            "wo": mha.out_proj.weight.detach().numpy().T.copy(),
            "bo": mha.out_proj.bias.detach().numpy().copy()}


def _ln(ln):
    import torch

    t = ln.norm if hasattr(ln, "norm") else ln
    return {"scale": t.weight.detach().numpy().copy(),
            "bias": t.bias.detach().numpy().copy()}


def _sb_encoder(enc, d):
    import torch

    layers = {}
    for i, layer in enumerate(enc.layers):
        lins = [m for m in layer.pos_ffn.ffn
                if isinstance(m, torch.nn.Linear)]
        layers[str(i)] = {
            "self_att": _mha(layer.self_att.att, d),
            "pos_ffn": {"ffn1": _lin(lins[0]), "ffn2": _lin(lins[1])},
            "norm1": _ln(layer.norm1),
            "norm2": _ln(layer.norm2),
        }
    return {"layers": layers, "norm": _ln(enc.norm)}


def _sb_tblock(blk, d):
    return {"encoder": _sb_encoder(blk.mdl, d)}


# NOTE: the reference's use_global_pos_enc=True path is broken in this
# checkout — Dual_Path_Model passes max_length as PositionalEncoding's
# input_size (dual_path.py:955), which crashes for any config where
# max_length != out_channels. Ours implements the evident intent
# (time-indexed encodings of width out_channels; see PARITY.md), so golden
# parity is only checkable with the positional encoding off.
@pytest.mark.parametrize("use_global_pos_enc", [False])
def test_dual_path_model_matches_reference(use_global_pos_enc):
    import torch

    import_reference_speechbrain()
    dp = importlib.import_module("speechbrain.lobes.models.dual_path")
    from svt_speechbrain_tpu.models.separation import (
        Dual_Path_Model, SBTransformerBlock)

    b, t, cin, d, h, ffn, tlayers, K, spks = 2, 110, 24, 16, 4, 32, 1, 20, 2
    torch.manual_seed(11)
    ref_intra = dp.SBTransformerBlock(
        num_layers=tlayers, d_model=d, nhead=h, d_ffn=ffn,
        use_positional_encoding=True, norm_before=True)
    ref_inter = dp.SBTransformerBlock(
        num_layers=tlayers, d_model=d, nhead=h, d_ffn=ffn,
        use_positional_encoding=True, norm_before=True)
    ref = dp.Dual_Path_Model(
        in_channels=cin, out_channels=d, intra_model=ref_intra,
        inter_model=ref_inter, num_layers=2, norm="ln", K=K,
        num_spks=spks, skip_around_intra=True,
        linear_layer_after_inter_intra=True,
        use_global_pos_enc=use_global_pos_enc, max_length=2000).eval()

    intra = SBTransformerBlock(tlayers, d, h, ffn,
                               use_positional_encoding=True,
                               norm_before=True)
    inter = SBTransformerBlock(tlayers, d, h, ffn,
                               use_positional_encoding=True,
                               norm_before=True)
    mine = Dual_Path_Model(cin, d, intra, inter, num_layers=2, norm="ln",
                           K=K, num_spks=spks,
                           use_global_pos_enc=use_global_pos_enc,
                           max_length=2000)

    params = {
        "norm": _gn(ref.norm),
        "conv_in": _conv1x1(ref.conv1d),
        "conv2d": {"w": ref.conv2d.weight.detach().numpy()[:, :, 0, 0].T.copy(),
                   "b": ref.conv2d.bias.detach().numpy().copy()},
        "end_conv": _conv1x1(ref.end_conv1x1),
        "output": _conv1x1(ref.output[0]),
        "output_gate": _conv1x1(ref.output_gate[0]),
        "prelu": {"alpha": ref.prelu.weight.detach().numpy()[0].copy()},
        "blocks": {},
    }
    for i, blk in enumerate(ref.dual_mdl):
        params["blocks"][str(i)] = {
            "intra": _sb_tblock(blk.intra_mdl, d),
            "inter": _sb_tblock(blk.inter_mdl, d),
            "intra_norm": _gn(blk.intra_norm),
            "inter_norm": _gn(blk.inter_norm),
            "intra_linear": _sb_lin(blk.intra_linear),
            "inter_linear": _sb_lin(blk.inter_linear),
        }

    rng = np.random.default_rng(12)
    x = rng.normal(size=(b, t, cin)).astype(np.float32)

    with torch.no_grad():
        # reference takes/returns channel-first: (B, N, L) → (spks, B, N, L)
        want = ref(torch.tensor(x).transpose(1, 2)).numpy()
    got = np.asarray(mine(params, jnp.asarray(x)))  # (B, T, spks, C)
    got_cf = got.transpose(2, 0, 3, 1)  # → (spks, B, C, L)
    assert got_cf.shape == want.shape, (got_cf.shape, want.shape)
    np.testing.assert_allclose(got_cf, want, atol=1e-5, rtol=1e-4)


def test_global_pos_enc_applies_scaled_encoding():
    """Our global-pos-enc path (the reference's evident intent): masks
    change exactly by routing pe(T) + sqrt(d)-scaled activations into the
    dual blocks, and stay finite/shaped."""
    from svt_speechbrain_tpu.models.separation import (
        Dual_Path_Model, SBTransformerBlock)
    import jax

    cin, d = 24, 16
    intra = SBTransformerBlock(1, d, 4, 32, use_positional_encoding=True)
    inter = SBTransformerBlock(1, d, 4, 32, use_positional_encoding=True)
    m_off = Dual_Path_Model(cin, d, intra, inter, num_layers=1, K=20,
                            use_global_pos_enc=False)
    m_on = Dual_Path_Model(cin, d, intra, inter, num_layers=1, K=20,
                           use_global_pos_enc=True, max_length=2000)
    params = m_off.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 90, cin)),
                    jnp.float32)
    off = np.asarray(m_off(params, x))
    on = np.asarray(m_on(params, x))
    assert on.shape == off.shape == (2, 90, 2, cin)
    assert np.isfinite(on).all()
    assert np.abs(on - off).max() > 1e-4  # the encoding actually applies
