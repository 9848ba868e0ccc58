"""Golden parity for the seq2seq attention modules and the
AttentionalRNNDecoder vs the reference torch implementations
(``speechbrain/nnet/attention.py:23-310``, ``speechbrain/nnet/RNN.py:713``):
content / location-aware / key-value attention (multi-step prev_attn
trajectories included) composed with rnn/gru/lstm cell stacks.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import import_reference_speechbrain, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")


def _torch(x):
    import torch

    return torch.tensor(np.asarray(x))


def _lin(t):
    """torch nn.Linear → our Linear params ((in, out) weight)."""
    p = {"w": jnp.asarray(t.weight.detach().numpy().T)}
    if t.bias is not None:
        p["b"] = jnp.asarray(t.bias.detach().numpy())
    return p


def _content_params(ref):
    return {"mlp_enc": _lin(ref.mlp_enc), "mlp_dec": _lin(ref.mlp_dec),
            "mlp_attn": _lin(ref.mlp_attn), "mlp_out": _lin(ref.mlp_out)}


def _location_params(ref):
    p = _content_params(ref)
    p["conv_loc"] = {"w": jnp.asarray(
        ref.conv_loc.weight.detach().numpy().transpose(2, 1, 0))}
    p["mlp_loc"] = _lin(ref.mlp_loc)
    return p


def _kv_params(ref):
    return {"key_linear": _lin(ref.key_linear),
            "query_linear": _lin(ref.query_linear),
            "value_linear": _lin(ref.value_linear)}


def test_content_based_attention_matches_reference():
    sb = import_reference_speechbrain()
    from svt_speechbrain_tpu.nnet.attention import ContentBasedAttention

    rng = np.random.default_rng(0)
    ref = sb.nnet.attention.ContentBasedAttention(
        enc_dim=10, dec_dim=7, attn_dim=6, output_dim=5, scaling=1.7)
    ours = ContentBasedAttention(enc_dim=10, dec_dim=7, attn_dim=6,
                                 output_dim=5, scaling=1.7)
    params = _content_params(ref)
    enc = rng.normal(size=(3, 9, 10)).astype(np.float32)
    enc_len = np.array([9, 6, 4])
    for _ in range(3):  # multiple steps — the memoized mask path
        dec = rng.normal(size=(3, 7)).astype(np.float32)
        want_c, want_w = ref(_torch(enc), _torch(enc_len), _torch(dec))
        got_c, got_w = ours(params, jnp.asarray(enc), jnp.asarray(enc_len),
                            jnp.asarray(dec))
        np.testing.assert_allclose(np.asarray(got_c),
                                   want_c.detach().numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_w),
                                   want_w.detach().numpy(), atol=2e-5)


def test_location_aware_attention_trajectory_matches_reference():
    """Three steps: the uniform 1/len start, then the detached prev_attn
    feedback through the location conv."""
    sb = import_reference_speechbrain()
    from svt_speechbrain_tpu.nnet.attention import LocationAwareAttention

    rng = np.random.default_rng(1)
    ref = sb.nnet.attention.LocationAwareAttention(
        enc_dim=10, dec_dim=7, attn_dim=6, output_dim=5, conv_channels=4,
        kernel_size=3, scaling=1.2)
    ours = LocationAwareAttention(enc_dim=10, dec_dim=7, attn_dim=6,
                                  output_dim=5, conv_channels=4,
                                  kernel_size=3, scaling=1.2)
    params = _location_params(ref)
    enc = rng.normal(size=(3, 9, 10)).astype(np.float32)
    enc_len = np.array([9, 7, 5])
    prev = None
    for _ in range(3):
        dec = rng.normal(size=(3, 7)).astype(np.float32)
        want_c, want_w = ref(_torch(enc), _torch(enc_len), _torch(dec))
        got_c, got_w = ours(params, jnp.asarray(enc), jnp.asarray(enc_len),
                            jnp.asarray(dec), prev_attn=prev)
        prev = got_w
        np.testing.assert_allclose(np.asarray(got_c),
                                   want_c.detach().numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_w),
                                   want_w.detach().numpy(), atol=2e-5)


def test_keyvalue_attention_matches_reference():
    sb = import_reference_speechbrain()
    from svt_speechbrain_tpu.nnet.attention import KeyValueAttention

    rng = np.random.default_rng(2)
    ref = sb.nnet.attention.KeyValueAttention(
        enc_dim=10, dec_dim=7, attn_dim=6, output_dim=5)
    ours = KeyValueAttention(enc_dim=10, dec_dim=7, attn_dim=6, output_dim=5)
    params = _kv_params(ref)
    enc = rng.normal(size=(3, 9, 10)).astype(np.float32)
    enc_len = np.array([9, 6, 4])
    dec = rng.normal(size=(3, 7)).astype(np.float32)
    want_c, want_w = ref(_torch(enc), _torch(enc_len), _torch(dec))
    got_c, got_w = ours(params, jnp.asarray(enc), jnp.asarray(enc_len),
                        jnp.asarray(dec))
    np.testing.assert_allclose(np.asarray(got_c),
                               want_c.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_w),
                               want_w.detach().numpy(), atol=2e-5)


def _cell_params(ref_cells):
    """torch nn.{RNN,GRU,LSTM}Cell list → our stacked-cell param dict."""
    params = {}
    for i, cell in enumerate(ref_cells):
        p = {"w_ih": jnp.asarray(cell.weight_ih.detach().numpy().T),
             "w_hh": jnp.asarray(cell.weight_hh.detach().numpy().T)}
        if cell.bias_ih is not None:
            p["b_ih"] = jnp.asarray(cell.bias_ih.detach().numpy())
            p["b_hh"] = jnp.asarray(cell.bias_hh.detach().numpy())
        params[f"l{i}"] = p
    return params


@pytest.mark.parametrize("rnn_type,attn_type", [
    ("gru", "content"), ("lstm", "keyvalue"), ("rnn", "location"),
    ("lstm", "content")])
def test_attentional_rnn_decoder_matches_reference(rnn_type, attn_type):
    """Full teacher-forced decode: outputs AND attention maps equal, with
    fractional wav_len exercising the round(T*len) masking, 2-layer cells,
    and every (cell, attention) pairing the recipes can configure."""
    sb = import_reference_speechbrain()
    from svt_speechbrain_tpu.nnet.rnn import AttentionalRNNDecoder

    rng = np.random.default_rng(3)
    kwargs = dict(rnn_type=rnn_type, attn_type=attn_type, hidden_size=7,
                  attn_dim=5, num_layers=2, enc_dim=10, input_size=6,
                  channels=4 if attn_type == "location" else None,
                  kernel_size=3 if attn_type == "location" else None,
                  scaling=1.3)
    ref = sb.nnet.RNN.AttentionalRNNDecoder(**kwargs)
    ref.eval()
    ours = AttentionalRNNDecoder(**kwargs)

    params = {"rnn": _cell_params(ref.rnn.rnn_cells),
              "proj": _lin(ref.proj)}
    if attn_type == "content":
        params["attn"] = _content_params(ref.attn)
    elif attn_type == "location":
        params["attn"] = _location_params(ref.attn)
    else:
        params["attn"] = _kv_params(ref.attn)

    inp = rng.normal(size=(3, 5, 6)).astype(np.float32)
    enc = rng.normal(size=(3, 9, 10)).astype(np.float32)
    wav_len = np.array([1.0, 0.8, 0.5], np.float32)
    want_out, want_attn = ref(_torch(inp), _torch(enc), _torch(wav_len))
    got_out, got_attn = ours(params, jnp.asarray(inp), jnp.asarray(enc),
                             jnp.asarray(wav_len))
    np.testing.assert_allclose(np.asarray(got_out),
                               want_out.detach().numpy(),
                               rtol=1e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_attn),
                               want_attn.detach().numpy(),
                               rtol=1e-5, atol=2e-5)
