"""Golden parity for the complex-valued networks vs the reference torch
implementations (``speechbrain/nnet/complex_networks/``): CLinear, CConv1d,
CConv2d, CBatchNorm (whitening + running-stat trajectory), CLayerNorm
(incl. the 2-D degenerate path), and the recurrences CRNN / CLSTM / CLiGRU
(all normalization modes).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import import_reference_speechbrain, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")



def _ref_complex():
    """Import the reference complex-network submodules (not re-exported by
    the package __init__)."""
    import importlib

    import_reference_speechbrain()
    return {name: importlib.import_module(
        f"speechbrain.nnet.complex_networks.{name}")
        for name in ("c_linear", "c_CNN", "c_normalization", "c_RNN")}

def _torch(x):
    import torch

    return torch.tensor(np.asarray(x))


def _lin_params(ref_lin, bias=True):
    """Torch CLinear → our param dict (same (in, out) weight layout)."""
    p = {"real_weight": jnp.asarray(ref_lin.real_weight.detach().numpy()),
         "imag_weight": jnp.asarray(ref_lin.imag_weight.detach().numpy())}
    if bias:
        p["bias"] = jnp.asarray(ref_lin.b.detach().numpy())
    return p


def _randomize_lin(ref_lin, rng, bias=True, scale=1.0):
    import torch

    with torch.no_grad():
        ref_lin.real_weight.copy_(_torch(scale * rng.normal(
            size=ref_lin.real_weight.shape).astype(np.float32)))
        ref_lin.imag_weight.copy_(_torch(scale * rng.normal(
            size=ref_lin.imag_weight.shape).astype(np.float32)))
        if bias:
            # the reference never initializes this tensor — fill it
            ref_lin.b.copy_(_torch(
                rng.normal(size=ref_lin.b.shape).astype(np.float32)))


def test_clinear_matches_reference():
    ref_mods = _ref_complex()
    from svt_speechbrain_tpu.nnet.complex_networks import CLinear

    rng = np.random.default_rng(0)
    for bias, ndim in [(True, 3), (True, 2), (False, 3)]:
        shape = (4, 9, 10) if ndim == 3 else (4, 10)
        ref = ref_mods["c_linear"].CLinear(
            n_neurons=6, input_shape=shape, bias=bias)
        _randomize_lin(ref, rng, bias=bias)
        ours = CLinear(n_neurons=6, input_size=10, bias=bias)
        x = rng.normal(size=shape).astype(np.float32)
        want = ref(_torch(x)).detach().numpy()
        got = np.asarray(ours(_lin_params(ref, bias=bias), jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=2e-5)


def _conv1d_params(ref, bias=True):
    # ref weight (out, in, k) → ours (k, in, out)
    p = {"real": {"w": jnp.asarray(
            ref.real_weight.detach().numpy().transpose(2, 1, 0))},
         "imag": {"w": jnp.asarray(
            ref.imag_weight.detach().numpy().transpose(2, 1, 0))}}
    if bias:
        p["bias"] = jnp.asarray(ref.b.detach().numpy())
    return p


def _randomize_conv(ref, rng, bias=True):
    import torch

    with torch.no_grad():
        ref.real_weight.copy_(_torch(
            rng.normal(size=ref.real_weight.shape).astype(np.float32)))
        ref.imag_weight.copy_(_torch(
            rng.normal(size=ref.imag_weight.shape).astype(np.float32)))
        if bias and ref.b is not None:
            ref.b.copy_(_torch(
                rng.normal(size=ref.b.shape).astype(np.float32)))


@pytest.mark.parametrize("padding,stride,dilation", [
    ("same", 1, 1), ("same", 2, 1), ("same", 1, 2),
    ("valid", 1, 1), ("causal", 1, 2)])
def test_cconv1d_matches_reference(padding, stride, dilation):
    """Reflect same-padding (the reference default), strided/dilated same,
    valid and causal modes."""
    ref_mods = _ref_complex()
    from svt_speechbrain_tpu.nnet.complex_networks import CConv1d

    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 20, 8)).astype(np.float32)
    ref = ref_mods["c_CNN"].CConv1d(
        out_channels=5, kernel_size=3, input_shape=x.shape,
        stride=stride, dilation=dilation, padding=padding)
    _randomize_conv(ref, rng)
    ours = CConv1d(out_channels=5, kernel_size=3, input_size=8,
                   stride=stride, dilation=dilation, padding=padding)
    want = ref(_torch(x)).detach().numpy()
    got = np.asarray(ours(_conv1d_params(ref), jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_cconv2d_matches_reference_axis_mapping():
    """Asymmetric kernel/stride pins the reference's k[0]→feature,
    k[1]→time axis convention."""
    ref_mods = _ref_complex()
    from svt_speechbrain_tpu.nnet.complex_networks import CConv2d

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 12, 9, 6)).astype(np.float32)  # (B, T, F, 2C)
    ref = ref_mods["c_CNN"].CConv2d(
        out_channels=4, kernel_size=(3, 5), input_shape=x.shape,
        stride=(1, 2), dilation=1, padding="same")
    _randomize_conv(ref, rng)
    ours = CConv2d(out_channels=4, kernel_size=(3, 5), input_size=6,
                   stride=(1, 2), padding="same")
    # ref weight (out, in, k0, k1) → ours (k1, k0, in, out)
    p = {"real": {"w": jnp.asarray(
            ref.real_weight.detach().numpy().transpose(3, 2, 1, 0))},
         "imag": {"w": jnp.asarray(
            ref.imag_weight.detach().numpy().transpose(3, 2, 1, 0))},
         "bias": jnp.asarray(ref.b.detach().numpy())}
    want = ref(_torch(x)).detach().numpy()
    got = np.asarray(ours(p, jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def _bn_params(ref):
    p = {}
    if ref.scale:
        p["gamma_rr"] = jnp.asarray(ref.gamma_rr.detach().numpy())
        p["gamma_ii"] = jnp.asarray(ref.gamma_ii.detach().numpy())
        p["gamma_ri"] = jnp.asarray(ref.gamma_ri.detach().numpy())
    if ref.center:
        p["beta"] = jnp.asarray(ref.beta.detach().numpy())
    return p


def _randomize_cbn_affine(ref, rng):
    import torch

    with torch.no_grad():
        if ref.scale:
            ref.gamma_rr.copy_(_torch(rng.uniform(
                0.5, 1.5, ref.gamma_rr.shape).astype(np.float32)))
            ref.gamma_ii.copy_(_torch(rng.uniform(
                0.5, 1.5, ref.gamma_ii.shape).astype(np.float32)))
            ref.gamma_ri.copy_(_torch(rng.normal(
                0, 0.2, ref.gamma_ri.shape).astype(np.float32)))
        if ref.center:
            ref.beta.copy_(_torch(rng.normal(
                size=ref.beta.shape).astype(np.float32)))


@pytest.mark.parametrize("momentum", [0.1, None])
def test_cbatchnorm_trajectory_matches_reference(momentum):
    """Three train steps (batch-stat whitening + running-stat updates with
    the eps-inflation quirk) followed by an eval step must match the
    reference bit-for-bit, for both torch momentum and cumulative-average
    modes."""
    ref_mods = _ref_complex()
    from svt_speechbrain_tpu.nnet.complex_networks import CBatchNorm

    rng = np.random.default_rng(3)
    ref = ref_mods["c_normalization"].CBatchNorm(
        input_size=8, momentum=momentum)
    _randomize_cbn_affine(ref, rng)
    ours = CBatchNorm(input_size=8, momentum=momentum)
    params, state = _bn_params(ref), ours.init_state()

    ref.train()
    for _ in range(3):
        x = rng.normal(size=(4, 6, 8)).astype(np.float32) * 2.0 + 0.5
        want = ref(_torch(x)).detach().numpy()
        got, state = ours(params, state, jnp.asarray(x), train=True)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    np.testing.assert_allclose(np.asarray(state["moving_Vrr"]),
                               ref.moving_Vrr.detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(state["moving_Vri"]),
                               ref.moving_Vri.detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(state["moving_mean"]),
                               ref.moving_mean.detach().numpy(), atol=1e-6)
    assert int(state["num_batches_tracked"]) == int(ref.num_batches_tracked)

    ref.eval()
    x = rng.normal(size=(5, 3, 8)).astype(np.float32)
    want = ref(_torch(x)).detach().numpy()
    got, _ = ours(params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_cbatchnorm_flag_modes_match_reference():
    """scale=False golden parity; scale=True+center=False CRASHES in the
    reference (c_normalization.py:203 only assigns centred_real under
    ``if self.center``) — ours implements the evident intent and must at
    least run."""
    ref_mods = _ref_complex()
    from svt_speechbrain_tpu.nnet.complex_networks import CBatchNorm

    rng = np.random.default_rng(4)
    x = rng.normal(size=(4, 5, 6)).astype(np.float32)

    ref = ref_mods["c_normalization"].CBatchNorm(
        input_size=6, scale=False, center=True)
    _randomize_cbn_affine(ref, rng)
    ours = CBatchNorm(input_size=6, scale=False, center=True)
    params, state = _bn_params(ref), ours.init_state()
    ref.train()
    want = ref(_torch(x)).detach().numpy()
    got, state = ours(params, state, jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
    ref.eval()
    want = ref(_torch(x)).detach().numpy()
    got, _ = ours(params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    ref = ref_mods["c_normalization"].CBatchNorm(
        input_size=6, scale=True, center=False)
    ref.train()
    with pytest.raises(UnboundLocalError):
        ref(_torch(x))
    ours = CBatchNorm(input_size=6, scale=True, center=False)
    got, _ = ours(ours.init(None), ours.init_state(), jnp.asarray(x),
                  train=True)
    assert np.isfinite(np.asarray(got)).all()


def test_clayernorm_matches_reference():
    """3-D whitening parity + the 2-D degenerate path (output == beta)."""
    ref_mods = _ref_complex()
    from svt_speechbrain_tpu.nnet.complex_networks import CLayerNorm

    rng = np.random.default_rng(5)
    ref = ref_mods["c_normalization"].CLayerNorm(input_size=8)
    _randomize_cbn_affine(ref, rng)
    ours = CLayerNorm(input_size=8)
    params = _bn_params(ref)

    x3 = rng.normal(size=(3, 7, 8)).astype(np.float32)
    want = ref(_torch(x3)).detach().numpy()
    got = np.asarray(ours(params, jnp.asarray(x3)))
    np.testing.assert_allclose(got, want, atol=1e-5)

    x2 = rng.normal(size=(6, 8)).astype(np.float32)
    want = ref(_torch(x2)).detach().numpy()
    got = np.asarray(ours(params, jnp.asarray(x2)))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # and that degenerate value is exactly broadcast beta
    np.testing.assert_allclose(
        got, np.broadcast_to(np.asarray(params["beta"]), got.shape),
        atol=1e-5)


def _rnn_layer_params(ref_layer, proj_bias):
    return {"w": _lin_params(ref_layer.w, bias=proj_bias),
            "u": _lin_params(ref_layer.u, bias=proj_bias)}


def _randomize_rnn(ref, rng, proj_bias):
    # modest weights keep the relu recurrences in a numerically tame range
    # (N(0,1) weights explode over 2 layers and drown parity in fp32 drift)
    for lay in ref.rnn:
        _randomize_lin(lay.w, rng, bias=proj_bias, scale=0.3)
        _randomize_lin(lay.u, rng, bias=proj_bias, scale=0.3)


@pytest.mark.parametrize("bidirectional", [False, True])
@pytest.mark.parametrize("nonlinearity", ["tanh", "relu"])
def test_crnn_matches_reference(bidirectional, nonlinearity):
    ref_mods = _ref_complex()
    from svt_speechbrain_tpu.nnet.complex_networks import CRNN

    rng = np.random.default_rng(6)
    x = rng.normal(size=(3, 9, 10)).astype(np.float32)
    ref = ref_mods["c_RNN"].CRNN(
        hidden_size=4, input_shape=x.shape, num_layers=2,
        nonlinearity=nonlinearity, bidirectional=bidirectional,
        return_hidden=True)
    ref.eval()
    _randomize_rnn(ref, rng, proj_bias=False)
    ours = CRNN(hidden_size=4, input_size=10, num_layers=2,
                nonlinearity=nonlinearity, bidirectional=bidirectional,
                return_hidden=True)
    params = {f"l{i}": _rnn_layer_params(ref.rnn[i], False)
              for i in range(2)}
    want_out, want_h = ref(_torch(x))
    got_out, got_h = ours(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_out),
                               want_out.detach().numpy(),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_h),
                               want_h.detach().numpy(),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("bidirectional", [False, True])
def test_clstm_matches_reference(bidirectional):
    """Pins the contiguous chunk(8)+cat gate slicing that cuts across the
    complex packing (c_RNN.py:316-321)."""
    ref_mods = _ref_complex()
    from svt_speechbrain_tpu.nnet.complex_networks import CLSTM

    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 8, 6)).astype(np.float32)
    ref = ref_mods["c_RNN"].CLSTM(
        hidden_size=3, input_shape=x.shape, num_layers=2,
        bidirectional=bidirectional, return_hidden=True)
    ref.eval()
    _randomize_rnn(ref, rng, proj_bias=True)
    ours = CLSTM(hidden_size=3, input_size=6, num_layers=2,
                 bidirectional=bidirectional, return_hidden=True)
    params = {f"l{i}": _rnn_layer_params(ref.rnn[i], True)
              for i in range(2)}
    want_out, want_h = ref(_torch(x))
    got_out, got_h = ours(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_out),
                               want_out.detach().numpy(),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_h),
                               want_h.detach().numpy(),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("bidirectional", [False, True])
def test_cligru_batchnorm_matches_reference(bidirectional):
    """Train-mode (batch-stat CBatchNorm + running-stat update) and
    eval-mode parity for the batchnorm'd complex LiGRU."""
    import torch

    ref_mods = _ref_complex()
    from svt_speechbrain_tpu.nnet.complex_networks import CLiGRU

    rng = np.random.default_rng(8)
    x = rng.normal(size=(3, 7, 8)).astype(np.float32)
    ref = ref_mods["c_RNN"].CLiGRU(
        hidden_size=4, input_shape=x.shape, num_layers=2,
        normalization="batchnorm", bidirectional=bidirectional)
    _randomize_rnn(ref, rng, proj_bias=False)
    for lay in ref.rnn:
        _randomize_cbn_affine(lay.norm, rng)
        with torch.no_grad():
            lay.norm.moving_Vrr.copy_(_torch(rng.uniform(
                0.5, 1.5, lay.norm.moving_Vrr.shape).astype(np.float32)))
            lay.norm.moving_Vii.copy_(_torch(rng.uniform(
                0.5, 1.5, lay.norm.moving_Vii.shape).astype(np.float32)))
            lay.norm.moving_Vri.copy_(_torch(rng.normal(
                0, 0.1, lay.norm.moving_Vri.shape).astype(np.float32)))
            lay.norm.moving_mean.copy_(_torch(rng.normal(
                size=lay.norm.moving_mean.shape).astype(np.float32)))

    ours = CLiGRU(hidden_size=4, input_size=8, num_layers=2,
                  normalization="batchnorm", bidirectional=bidirectional)
    params = {}
    state = {}
    for i in range(2):
        params[f"l{i}"] = _rnn_layer_params(ref.rnn[i], False)
        params[f"l{i}"]["norm"] = _bn_params(ref.rnn[i].norm)
        n = ref.rnn[i].norm
        state[f"l{i}"] = {
            "num_batches_tracked": jnp.asarray(
                int(n.num_batches_tracked), jnp.int32),
            "moving_Vrr": jnp.asarray(n.moving_Vrr.numpy()),
            "moving_Vii": jnp.asarray(n.moving_Vii.numpy()),
            "moving_Vri": jnp.asarray(n.moving_Vri.numpy()),
            "moving_mean": jnp.asarray(n.moving_mean.numpy()),
        }

    ref.train()
    want = ref(_torch(x)).detach().numpy()
    got, state = ours(params, state, jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-4)
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(state[f"l{i}"]["moving_Vrr"]),
            ref.rnn[i].norm.moving_Vrr.detach().numpy(), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(state[f"l{i}"]["moving_mean"]),
            ref.rnn[i].norm.moving_mean.detach().numpy(), atol=1e-6)

    ref.eval()
    want = ref(_torch(x)).detach().numpy()
    got, _ = ours(params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-4)


def test_cligru_layernorm_degenerate_matches_reference():
    """The reference's layernorm mode (and its any-other-string fallback)
    flattens to 2-D before CLayerNorm, which zeroes the feed-forward
    projection entirely — mirrored, golden-tested."""
    ref_mods = _ref_complex()
    from svt_speechbrain_tpu.nnet.complex_networks import CLiGRU

    rng = np.random.default_rng(9)
    x = rng.normal(size=(2, 6, 8)).astype(np.float32)
    ref = ref_mods["c_RNN"].CLiGRU(
        hidden_size=4, input_shape=x.shape, num_layers=1,
        normalization="layernorm")
    ref.eval()
    _randomize_rnn(ref, rng, proj_bias=False)
    _randomize_cbn_affine(ref.rnn[0].norm, rng)
    ours = CLiGRU(hidden_size=4, input_size=8, num_layers=1,
                  normalization="layernorm")
    params = {"l0": _rnn_layer_params(ref.rnn[0], False)}
    params["l0"]["norm"] = _bn_params(ref.rnn[0].norm)
    want = ref(_torch(x)).detach().numpy()
    got, _ = ours(params, ours.init_state(), jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-4)
