"""Golden torch parity for the transformer lobes vs the reference
speechbrain implementations (``speechbrain/lobes/models/transformer/``):
converted weights → equal outputs, for the encoder (post-LN and pre-LN),
the decoder (causal + cross attention), and masked inputs.

These stacks underpin TransformerASR/LM/SE/ST and the Conformer, so layer
parity here covers the family's numerics at the root.
"""
import importlib

import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import import_reference_speechbrain, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")


def _mha_params(mha, d_model):
    """torch nn.MultiheadAttention (packed in_proj) → our MHA params."""
    w = mha.in_proj_weight.detach().numpy()
    b = mha.in_proj_bias.detach().numpy()
    return {
        "wq": w[:d_model].T.copy(), "bq": b[:d_model].copy(),
        "wk": w[d_model:2 * d_model].T.copy(),
        "bk": b[d_model:2 * d_model].copy(),
        "wv": w[2 * d_model:].T.copy(), "bv": b[2 * d_model:].copy(),
        "wo": mha.out_proj.weight.detach().numpy().T.copy(),
        "bo": mha.out_proj.bias.detach().numpy().copy(),
    }


def _ln_params(ln):
    # sb LayerNorm wraps torch LayerNorm as .norm
    t = ln.norm if hasattr(ln, "norm") else ln
    return {"scale": t.weight.detach().numpy().copy(),
            "bias": t.bias.detach().numpy().copy()}


def _ffn_params(ffn):
    """sb PositionalwiseFeedForward (Sequential Linear-act-Linear)."""
    import torch

    linears = [m for m in ffn.ffn if isinstance(m, torch.nn.Linear)]
    return {
        "ffn1": {"w": linears[0].weight.detach().numpy().T.copy(),
                 "b": linears[0].bias.detach().numpy().copy()},
        "ffn2": {"w": linears[1].weight.detach().numpy().T.copy(),
                 "b": linears[1].bias.detach().numpy().copy()},
    }


def _enc_layer_params(layer, d_model):
    return {
        "self_att": _mha_params(layer.self_att.att, d_model),
        "pos_ffn": _ffn_params(layer.pos_ffn),
        "norm1": _ln_params(layer.norm1),
        "norm2": _ln_params(layer.norm2),
    }


@pytest.mark.parametrize("normalize_before", [False, True])
def test_transformer_encoder_matches_reference(normalize_before):
    import torch

    import_reference_speechbrain()
    ref_mod = importlib.import_module(
        "speechbrain.lobes.models.transformer.Transformer")
    from svt_speechbrain_tpu.models.transformer import TransformerEncoder

    b, t, d, h, ffn, layers = 3, 12, 32, 4, 64, 2
    torch.manual_seed(0)
    ref = ref_mod.TransformerEncoder(
        num_layers=layers, nhead=h, d_ffn=ffn, d_model=d, dropout=0.0,
        normalize_before=normalize_before).eval()
    mine = TransformerEncoder(num_layers=layers, nhead=h, d_ffn=ffn,
                              d_model=d, dropout=0.0,
                              normalize_before=normalize_before)
    params = {
        "layers": {str(i): _enc_layer_params(ref.layers[i], d)
                   for i in range(layers)},
        "norm": _ln_params(ref.norm),
    }
    rng = np.random.default_rng(1)
    x = rng.normal(size=(b, t, d)).astype(np.float32)

    with torch.no_grad():
        want, _ = ref(torch.tensor(x))
    got, _ = mine(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               atol=1e-5, rtol=1e-4)

    # with key padding: row 1 has 4 padded positions
    kpm = np.zeros((b, t), dtype=bool)
    kpm[1, -4:] = True
    with torch.no_grad():
        want_m, _ = ref(torch.tensor(x),
                        src_key_padding_mask=torch.tensor(kpm))
    got_m, _ = mine(params, jnp.asarray(x),
                    src_key_padding_mask=jnp.asarray(kpm))
    np.testing.assert_allclose(np.asarray(got_m), want_m.numpy(),
                               atol=1e-5, rtol=1e-4)


def test_transformer_decoder_matches_reference():
    import torch

    import_reference_speechbrain()
    ref_mod = importlib.import_module(
        "speechbrain.lobes.models.transformer.Transformer")
    from svt_speechbrain_tpu.models.transformer import (
        TransformerDecoder, get_lookahead_mask)

    b, tq, tk, d, h, ffn, layers = 2, 6, 9, 32, 4, 64, 2
    torch.manual_seed(2)
    ref = ref_mod.TransformerDecoder(
        num_layers=layers, nhead=h, d_ffn=ffn, d_model=d, dropout=0.0,
        normalize_before=False).eval()
    mine = TransformerDecoder(num_layers=layers, nhead=h, d_ffn=ffn,
                              d_model=d, dropout=0.0,
                              normalize_before=False)

    params = {"layers": {}, "norm": _ln_params(ref.norm)}
    for i, layer in enumerate(ref.layers):
        params["layers"][str(i)] = {
            "self_attn": _mha_params(layer.self_attn.att, d),
            "mutihead_attn": _mha_params(layer.mutihead_attn.att, d),
            "pos_ffn": _ffn_params(layer.pos_ffn),
            "norm1": _ln_params(layer.norm1),
            "norm2": _ln_params(layer.norm2),
            "norm3": _ln_params(layer.norm3),
        }

    rng = np.random.default_rng(3)
    tgt = rng.normal(size=(b, tq, d)).astype(np.float32)
    mem = rng.normal(size=(b, tk, d)).astype(np.float32)
    ref_mask = ref_mod.get_lookahead_mask(torch.tensor(tgt))
    my_mask = get_lookahead_mask(jnp.asarray(tgt))

    with torch.no_grad():
        want = ref(torch.tensor(tgt), torch.tensor(mem),
                   tgt_mask=ref_mask)[0]
    got = mine(params, jnp.asarray(tgt), jnp.asarray(mem),
               tgt_mask=my_mask)[0]
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               atol=1e-5, rtol=1e-4)


def _conv_module_params(cm):
    """Reference ConvolutionModule → our params+state."""
    pw1 = cm.bottleneck[0]
    dw = cm.conv
    bn = cm.after_conv[0]
    pw2 = cm.after_conv[2]
    params = {
        "pre_norm": {"scale": cm.layer_norm.weight.detach().numpy().copy(),
                     "bias": cm.layer_norm.bias.detach().numpy().copy()},
        # 1x1 torch convs (out, in, 1) ≡ linear (in, out)
        "pw1": {"w": pw1.weight.detach().numpy()[:, :, 0].T.copy(),
                "b": pw1.bias.detach().numpy().copy()},
        "dw": {"w": np.transpose(dw.weight.detach().numpy(),
                                 (2, 1, 0)).copy(),
               "b": dw.bias.detach().numpy().copy()},
        "norm": {"scale": bn.weight.detach().numpy().copy(),
                 "bias": bn.bias.detach().numpy().copy()},
        "pw2": {"w": pw2.weight.detach().numpy()[:, :, 0].T.copy(),
                "b": pw2.bias.detach().numpy().copy()},
    }
    state = {"mean": bn.running_mean.numpy().copy(),
             "var": bn.running_var.numpy().copy()}
    return params, state


def test_conformer_encoder_matches_reference():
    """Full ConformerEncoder (regular MHA so no rel-pos-embedding input
    convention to match) with converted weights + BN running stats: equal
    outputs in eval AND train mode."""
    import torch

    import_reference_speechbrain()
    ref_mod = importlib.import_module(
        "speechbrain.lobes.models.transformer.Conformer")
    from svt_speechbrain_tpu.models.conformer import ConformerEncoder

    b, t, d, h, ffn, layers, ks = 4, 16, 32, 4, 64, 2, 7
    torch.manual_seed(5)
    ref = ref_mod.ConformerEncoder(
        num_layers=layers, d_model=d, d_ffn=ffn, nhead=h, kernel_size=ks,
        dropout=0.0, attention_type="regularMHA", causal=False).eval()
    mine = ConformerEncoder(num_layers=layers, d_model=d, d_ffn=ffn,
                            nhead=h, kernel_size=ks, dropout=0.0,
                            attention_type="regularMHA", causal=False)

    rng = np.random.default_rng(6)
    params, state = {}, {}
    for i, layer in enumerate(ref.layers):
        conv_p, conv_s = _conv_module_params(layer.convolution_module)
        # randomize BN running stats so eval mode is nontrivial
        conv_s["mean"] = rng.normal(size=d).astype(np.float32)
        conv_s["var"] = rng.uniform(0.5, 2.0, d).astype(np.float32)
        with torch.no_grad():
            bn = layer.convolution_module.after_conv[0]
            bn.running_mean.copy_(torch.tensor(conv_s["mean"]))
            bn.running_var.copy_(torch.tensor(conv_s["var"]))
        ffn1 = _ffn_params(layer.ffn_module1[1])
        ffn2 = _ffn_params(layer.ffn_module2[1])
        params[str(i)] = {
            "mha": _mha_params(layer.mha_layer.att, d),
            "conv": conv_p,
            "ffn1_a": ffn1["ffn1"], "ffn1_b": ffn1["ffn2"],
            "ffn2_a": ffn2["ffn1"], "ffn2_b": ffn2["ffn2"],
            "norm_ff1": _ln_params(layer.ffn_module1[0]),
            "norm_ff2": _ln_params(layer.ffn_module2[0]),
            "norm_mha": _ln_params(layer.norm1),
            "norm_out": _ln_params(layer.norm2),
        }
        state[str(i)] = {"conv": conv_s}

    x = rng.normal(size=(b, t, d)).astype(np.float32)

    with torch.no_grad():
        want = ref(torch.tensor(x))[0].numpy()
    got, _ = mine(params, jnp.asarray(x), state=state, train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-4)

    ref.train()
    with torch.no_grad():
        want_train = ref(torch.tensor(x))[0].numpy()
    got_train, new_state = mine(params, jnp.asarray(x), state=state,
                                train=True)
    np.testing.assert_allclose(np.asarray(got_train), want_train,
                               atol=1e-4, rtol=1e-3)
    for i, layer in enumerate(ref.layers):
        bn = layer.convolution_module.after_conv[0]
        np.testing.assert_allclose(
            np.asarray(new_state[str(i)]["conv"]["mean"]),
            bn.running_mean.numpy(), atol=1e-5, rtol=1e-4)


def test_relpos_attention_matches_reference():
    """RelPosEncXL positional encodings and RelPosMHAXL attention equal the
    reference (converted packed in_proj + linear_pos + pos biases),
    including the reference's 1/sqrt(embed_dim) score scaling and
    key-padding masking."""
    import torch

    sb = import_reference_speechbrain()
    from svt_speechbrain_tpu.nnet.attention import RelPosEncXL, RelPosMHAXL

    b, t, d, h = 3, 14, 32, 4
    torch.manual_seed(7)
    ref_pe = sb.nnet.attention.RelPosEncXL(d)
    ref = sb.nnet.attention.RelPosMHAXL(d, h, dropout=0.0).eval()

    rng = np.random.default_rng(8)
    x = rng.normal(size=(b, t, d)).astype(np.float32)

    with torch.no_grad():
        pos_ref = ref_pe(torch.tensor(x))
    pos_my = RelPosEncXL(d)(None, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(pos_my), pos_ref.numpy(),
                               atol=1e-6)

    # the reference SELF-attention path views the packed projection as
    # (H, 3*dh) and chunks per head (attention.py:551-557) — q/k/v rows are
    # INTERLEAVED per head, unlike the plain [q; k; v] block layout its own
    # cross-attention path uses. Convert accordingly.
    dh = d // h
    w3 = ref.in_proj_weight.detach().numpy().reshape(h, 3, dh, d)
    params = {
        "wq": w3[:, 0].reshape(d, d).T.copy(),
        "wk": w3[:, 1].reshape(d, d).T.copy(),
        "wv": w3[:, 2].reshape(d, d).T.copy(),
        "wo": ref.out_proj.weight.detach().numpy().T.copy(),
        "bo": ref.out_proj.bias.detach().numpy().copy(),
        "wpos": ref.linear_pos.weight.detach().numpy().T.copy(),
        # stored (dh, H) but VIEWed as (H, dh) in the forward
        # (attention.py:586-592) — raw-memory reshape, not a transpose
        "u": ref.pos_bias_u.detach().numpy().reshape(h, dh).copy(),
        "v": ref.pos_bias_v.detach().numpy().reshape(h, dh).copy(),
    }
    mine = RelPosMHAXL(d, h, dropout=0.0)

    with torch.no_grad():
        want, _ = ref(torch.tensor(x), torch.tensor(x), torch.tensor(x),
                      pos_embs=pos_ref)
    got, _ = mine(params, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
                  pos_embs=jnp.asarray(pos_my))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               atol=1e-5, rtol=1e-4)

    kpm = np.zeros((b, t), dtype=bool)
    kpm[0, -5:] = True
    with torch.no_grad():
        want_m, _ = ref(torch.tensor(x), torch.tensor(x), torch.tensor(x),
                        pos_embs=pos_ref,
                        key_padding_mask=torch.tensor(kpm))
    got_m, _ = mine(params, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
                    pos_embs=jnp.asarray(pos_my),
                    key_padding_mask=jnp.asarray(kpm))
    np.testing.assert_allclose(np.asarray(got_m), want_m.numpy(),
                               atol=1e-5, rtol=1e-4)
