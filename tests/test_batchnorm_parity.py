"""Exact-parity BatchNorm in LiGRU and Xvector vs the reference torch
implementations (closing two "Known deviations": the LayerNorm
substitutions are gone).

Both tests copy random-init reference weights AND nontrivial running
statistics into our modules and assert train-mode (batch statistics) and
eval-mode (running statistics) outputs match, plus the updated running
stats after a train step.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import import_reference_speechbrain, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")


def _randomize_bn(bn, rng):
    import torch

    with torch.no_grad():
        bn.weight.copy_(torch.tensor(
            rng.uniform(0.5, 1.5, bn.weight.shape).astype(np.float32)))
        bn.bias.copy_(torch.tensor(
            rng.normal(size=bn.bias.shape).astype(np.float32)))
        bn.running_mean.copy_(torch.tensor(
            rng.normal(size=bn.running_mean.shape).astype(np.float32)))
        bn.running_var.copy_(torch.tensor(
            rng.uniform(0.5, 2.0, bn.running_var.shape).astype(np.float32)))


@pytest.mark.parametrize("bidirectional", [False, True])
def test_ligru_matches_reference_torch(bidirectional):
    """Reference LiGRU (batchnorm, momentum 0.05, flattened-frame stats,
    shared bidirectional weights, (candidate, update) gate order) vs ours:
    same weights + running stats → same outputs in train AND eval mode,
    same updated running statistics."""
    import torch

    sb = import_reference_speechbrain()
    from svt_speechbrain_tpu.nnet.rnn import LiGRU

    b, t, f, h, layers = 3, 12, 10, 8, 2
    torch.manual_seed(0)
    ref = sb.nnet.RNN.LiGRU(hidden_size=h, input_shape=(b, t, f),
                            num_layers=layers, nonlinearity="relu",
                            normalization="batchnorm", dropout=0.0,
                            bidirectional=bidirectional)
    rng = np.random.default_rng(1)
    params = {}
    state = {}
    for i, layer in enumerate(ref.rnn):
        _randomize_bn(layer.norm, rng)
        params[f"l{i}"] = {
            "w": layer.w.weight.detach().numpy().T.copy(),
            "u": layer.u.weight.detach().numpy().T.copy(),
            "norm": {"scale": layer.norm.weight.detach().numpy().copy(),
                     "bias": layer.norm.bias.detach().numpy().copy()},
        }
        state[f"l{i}"] = {
            "mean": layer.norm.running_mean.numpy().copy(),
            "var": layer.norm.running_var.numpy().copy(),
        }

    mine = LiGRU(hidden_size=h, input_size=f, num_layers=layers,
                 nonlinearity="relu", normalization="batchnorm",
                 bidirectional=bidirectional, dropout=0.0)
    x = rng.normal(size=(b, t, f)).astype(np.float32)

    # ---- eval mode: running statistics
    ref.eval()
    with torch.no_grad():
        want_eval, _ = ref(torch.tensor(x))
    got_eval, _, _ = mine(params, jnp.asarray(x), state=state, train=False)
    np.testing.assert_allclose(np.asarray(got_eval), want_eval.numpy(),
                               atol=1e-5, rtol=1e-4)

    # ---- train mode: batch statistics + running-stat update
    ref.train()
    with torch.no_grad():
        want_train, _ = ref(torch.tensor(x))
    got_train, _, new_state = mine(params, jnp.asarray(x), state=state,
                                   train=True)
    np.testing.assert_allclose(np.asarray(got_train), want_train.numpy(),
                               atol=1e-5, rtol=1e-4)
    for i, layer in enumerate(ref.rnn):
        np.testing.assert_allclose(
            np.asarray(new_state[f"l{i}"]["mean"]),
            layer.norm.running_mean.numpy(), atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(new_state[f"l{i}"]["var"]),
            layer.norm.running_var.numpy(), atol=1e-5, rtol=1e-4)


def test_xvector_matches_reference_torch():
    """Reference Xvector (Conv1d → activation → BatchNorm1d TDNN blocks)
    vs ours with converted weights + running stats, train and eval."""
    import torch

    import importlib

    import_reference_speechbrain()
    ref_mod = importlib.import_module("speechbrain.lobes.models.Xvector")
    from svt_speechbrain_tpu.models.xvector import Xvector

    b, t, f = 3, 20, 24
    channels = (16, 16, 16, 16, 32)
    torch.manual_seed(2)
    ref = ref_mod.Xvector(
        in_channels=f, tdnn_channels=list(channels), lin_neurons=12)
    rng = np.random.default_rng(3)

    mine = Xvector(in_channels=f, tdnn_channels=channels, lin_neurons=12)
    params = {}
    state = {}
    # reference blocks: [conv, act, norm] × 5, pool, linear
    for i in range(5):
        conv = ref.blocks[3 * i].conv
        norm = ref.blocks[3 * i + 2].norm
        _randomize_bn(norm, rng)
        params[f"tdnn{i}"] = {
            "conv": {"w": np.transpose(conv.weight.detach().numpy(),
                                       (2, 1, 0)).copy(),
                     "b": conv.bias.detach().numpy().copy()},
            "norm": {"scale": norm.weight.detach().numpy().copy(),
                     "bias": norm.bias.detach().numpy().copy()},
        }
        state[f"tdnn{i}"] = {"mean": norm.running_mean.numpy().copy(),
                             "var": norm.running_var.numpy().copy()}
    fc = ref.blocks[-1].w
    params["fc"] = {"w": fc.weight.detach().numpy().T.copy(),
                    "b": fc.bias.detach().numpy().copy()}

    x = rng.normal(size=(b, t, f)).astype(np.float32)

    ref.eval()
    with torch.no_grad():
        want_eval = ref(torch.tensor(x)).numpy()
    got_eval, _ = mine(params, jnp.asarray(x), state=state, train=False)
    np.testing.assert_allclose(np.asarray(got_eval), want_eval,
                               atol=1e-4, rtol=1e-3)

    ref.train()
    with torch.no_grad():
        want_train = ref(torch.tensor(x)).numpy()
    got_train, new_state = mine(params, jnp.asarray(x), state=state,
                                train=True)
    np.testing.assert_allclose(np.asarray(got_train), want_train,
                               atol=1e-4, rtol=1e-3)
    for i in range(5):
        norm = ref.blocks[3 * i + 2].norm
        np.testing.assert_allclose(
            np.asarray(new_state[f"tdnn{i}"]["mean"]),
            norm.running_mean.numpy(), atol=1e-5, rtol=1e-4)


def test_ecapa_matches_reference_torch():
    """Reference ECAPA-TDNN (BatchNorm1d everywhere + reflect same-padding)
    vs ours with converted weights + running stats, eval and train mode."""
    import importlib

    import torch

    import_reference_speechbrain()
    ref_mod = importlib.import_module("speechbrain.lobes.models.ECAPA_TDNN")
    from svt_speechbrain_tpu.models.ecapa_tdnn import ECAPA_TDNN

    b, t, f = 8, 30, 20
    channels = (16, 16, 16, 16, 48)
    torch.manual_seed(4)
    ref = ref_mod.ECAPA_TDNN(input_size=f, lin_neurons=12,
                             channels=list(channels),
                             attention_channels=8, res2net_scale=4,
                             se_channels=8)
    mine = ECAPA_TDNN(input_size=f, lin_neurons=12, channels=channels,
                      attention_channels=8, res2net_scale=4, se_channels=8)
    rng = np.random.default_rng(5)

    def conv_p(conv):
        p = {"w": np.transpose(conv.conv.weight.detach().numpy(),
                               (2, 1, 0)).copy()}
        if conv.conv.bias is not None:
            p["b"] = conv.conv.bias.detach().numpy().copy()
        return p

    def bn_p(norm):
        _randomize_bn(norm.norm, rng)
        return ({"scale": norm.norm.weight.detach().numpy().copy(),
                 "bias": norm.norm.bias.detach().numpy().copy()},
                {"mean": norm.norm.running_mean.numpy().copy(),
                 "var": norm.norm.running_var.numpy().copy()})

    def tdnn_p(block):
        pn, st = bn_p(block.norm)
        return {"conv": conv_p(block.conv), "norm": pn}, st

    params, state = {}, {}
    params["block0"], state["block0"] = tdnn_p(ref.blocks[0])
    for i, blk in enumerate(ref.blocks[1:4]):
        p, s = {}, {}
        p["tdnn1"], s["tdnn1"] = tdnn_p(blk.tdnn1)
        res_p, res_s = {}, {}
        for j, sub in enumerate(blk.res2net_block.blocks):
            res_p[str(j)], res_s[str(j)] = tdnn_p(sub)
        p["res2net"], s["res2net"] = res_p, res_s
        p["tdnn2"], s["tdnn2"] = tdnn_p(blk.tdnn2)
        p["se"] = {"conv1": conv_p(blk.se_block.conv1),
                   "conv2": conv_p(blk.se_block.conv2)}
        if hasattr(blk, "shortcut") and blk.shortcut is not None:
            p["shortcut"] = conv_p_raw(blk.shortcut)
        params[f"block{i + 1}"], state[f"block{i + 1}"] = p, s
    params["mfa"], state["mfa"] = tdnn_p(ref.mfa)
    asp_tdnn_p, asp_tdnn_s = tdnn_p(ref.asp.tdnn)
    params["asp"] = {"tdnn": asp_tdnn_p, "conv": conv_p_raw(ref.asp.conv)}
    state["asp"] = asp_tdnn_s
    pn, st = bn_p(ref.asp_bn)
    params["asp_norm"], state["asp_norm"] = pn, st
    params["fc"] = conv_p_raw(ref.fc)

    x = rng.normal(size=(b, t, f)).astype(np.float32)

    ref.eval()
    with torch.no_grad():
        want_eval = ref(torch.tensor(x)).numpy()
    got_eval, _ = mine(params, jnp.asarray(x), state=state, train=False)
    np.testing.assert_allclose(np.asarray(got_eval), want_eval,
                               atol=1e-4, rtol=1e-3)

    ref.train()
    with torch.no_grad():
        want_train = ref(torch.tensor(x)).numpy()
    got_train, _ = mine(params, jnp.asarray(x), state=state, train=True)
    # train-mode asp_bn normalizes the pooled (B, 1, C) stats by a tiny
    # batch variance, which amplifies fp accumulation-order differences
    np.testing.assert_allclose(np.asarray(got_train), want_train,
                               atol=2e-3, rtol=2e-3)


def conv_p_raw(conv):
    """speechbrain bare Conv1d (not TDNN-wrapped)."""
    p = {"w": np.transpose(conv.conv.weight.detach().numpy(),
                           (2, 1, 0)).copy()}
    if conv.conv.bias is not None:
        p["b"] = conv.conv.bias.detach().numpy().copy()
    return p


def _ligru_params_nostate(ref):
    """Extract our param tree from a reference LiGRU (any normalization)."""
    params = {}
    for i, layer in enumerate(ref.rnn):
        params[f"l{i}"] = {
            "w": layer.w.weight.detach().numpy().T.copy(),
            "u": layer.u.weight.detach().numpy().T.copy(),
            "norm": {"scale": layer.norm.weight.detach().numpy().copy(),
                     "bias": layer.norm.bias.detach().numpy().copy()},
        }
    return params


@pytest.mark.parametrize("bidirectional", [False, True])
def test_ligru_per_layer_hx_matches_reference(bidirectional):
    """Reference LiGRU indexes hx per layer (RNN.py:1102-1111), reshaping
    (num_layers*n_dir, B, H) to fold direction into batch when
    bidirectional. Feed a nontrivial per-layer initial state to both."""
    import torch

    sb = import_reference_speechbrain()
    from svt_speechbrain_tpu.nnet.rnn import LiGRU

    b, t, f, h, layers = 3, 7, 6, 8, 2
    n_dir = 2 if bidirectional else 1
    torch.manual_seed(3)
    ref = sb.nnet.RNN.LiGRU(hidden_size=h, input_shape=(b, t, f),
                            num_layers=layers, nonlinearity="relu",
                            normalization="layernorm", dropout=0.0,
                            bidirectional=bidirectional)
    params = _ligru_params_nostate(ref)
    mine = LiGRU(hidden_size=h, input_size=f, num_layers=layers,
                 nonlinearity="relu", normalization="layernorm",
                 bidirectional=bidirectional, dropout=0.0)

    rng = np.random.default_rng(4)
    x = rng.normal(size=(b, t, f)).astype(np.float32)
    hx = rng.normal(size=(layers * n_dir, b, h)).astype(np.float32)

    ref.eval()
    with torch.no_grad():
        want, _ = ref(torch.tensor(x), hx=torch.tensor(hx))
    got, _ = mine(params, jnp.asarray(x), hx=jnp.asarray(hx))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               atol=1e-5, rtol=1e-4)


def test_ligru_unknown_normalization_applies_layernorm():
    """The reference's else branch still applies LayerNorm for unknown
    normalization strings (RNN.py:1188-1191); ours must too."""
    import torch

    sb = import_reference_speechbrain()
    from svt_speechbrain_tpu.nnet.rnn import LiGRU

    b, t, f, h = 2, 5, 4, 8
    torch.manual_seed(5)
    ref = sb.nnet.RNN.LiGRU(hidden_size=h, input_shape=(b, t, f),
                            num_layers=1, nonlinearity="relu",
                            normalization="nonorm", dropout=0.0)
    params = _ligru_params_nostate(ref)
    mine = LiGRU(hidden_size=h, input_size=f, num_layers=1,
                 nonlinearity="relu", normalization="nonorm", dropout=0.0)
    rng = np.random.default_rng(6)
    x = rng.normal(size=(b, t, f)).astype(np.float32)
    ref.eval()
    with torch.no_grad():
        want, _ = ref(torch.tensor(x))
    got, _ = mine(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               atol=1e-5, rtol=1e-4)


def test_ligru_recurrent_dropout_semantics():
    """Train-mode dropout is the reference's recurrent mask on the
    candidate activation (one (B', H) mask shared across timesteps,
    applied inside every layer — RNN.py:1257,1264), not between-layer
    dropout. Statistical check: with p=0.5 and relu candidates, each
    (row, unit) is either fully active or fully scaled across time."""
    import jax

    from svt_speechbrain_tpu.nnet.rnn import LiGRU

    b, t, f, h = 4, 10, 6, 16
    mine = LiGRU(hidden_size=h, input_size=f, num_layers=1,
                 nonlinearity="relu", normalization="layernorm",
                 dropout=0.5)
    params = mine.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(b, t, f)).astype(np.float32))

    # eval: no dropout regardless of rng
    ye1, _ = mine(params, x, train=False, rng=jax.random.PRNGKey(1))
    ye2, _ = mine(params, x, train=False)
    np.testing.assert_allclose(np.asarray(ye1), np.asarray(ye2))

    yt, _ = mine(params, x, train=True, rng=jax.random.PRNGKey(2))
    yt = np.asarray(yt)
    # h_t = z h_{t-1} + (1-z) (act * mask): with h0 = 0, a dropped unit's
    # hidden state stays exactly 0 for the whole sequence
    dropped = np.all(yt == 0.0, axis=1)  # (B, H)
    frac = dropped.mean()
    assert 0.2 < frac < 0.8, f"dropped fraction {frac} not ~0.5"
    # different rng -> different mask
    yt2, _ = mine(params, x, train=True, rng=jax.random.PRNGKey(3))
    assert not np.allclose(yt, np.asarray(yt2))
