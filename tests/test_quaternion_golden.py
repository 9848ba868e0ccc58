"""Golden parity for the quaternion-valued networks vs the reference torch
implementations (``speechbrain/nnet/quaternion_networks/``): QLinear (incl.
spinor/vector_scale rotations), QConv1d/QConv2d (incl. spinor), QBatchNorm
(train trajectory + the uncentered-train / variance-divide-eval quirks),
and the recurrences QRNN / QLSTM / QLiGRU.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import import_reference_speechbrain, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")


def _ref_quat():
    import importlib

    import_reference_speechbrain()
    return {name: importlib.import_module(
        f"speechbrain.nnet.quaternion_networks.{name}")
        for name in ("q_linear", "q_CNN", "q_normalization", "q_RNN")}


def _torch(x):
    import torch

    return torch.tensor(np.asarray(x))


COMPS = ("r_weight", "i_weight", "j_weight", "k_weight")


def _randomize_qlin(ref, rng, bias=True, scale=0.5):
    import torch

    with torch.no_grad():
        for name in COMPS:
            w = getattr(ref, name)
            w.copy_(_torch(scale * rng.normal(
                size=w.shape).astype(np.float32)))
        if bias:
            ref.b.copy_(_torch(rng.normal(
                size=ref.b.shape).astype(np.float32)))


def _qlin_params(ref, bias=True):
    p = {name: jnp.asarray(getattr(ref, name).detach().numpy())
         for name in COMPS}
    if bias:
        p["bias"] = jnp.asarray(ref.b.detach().numpy())
    if getattr(ref, "vector_scale", False):
        p["scale"] = jnp.asarray(ref.scale_param.detach().numpy())
    return p


@pytest.mark.parametrize("bias,ndim", [(True, 3), (True, 2), (False, 3)])
def test_qlinear_matches_reference(bias, ndim):
    ref_mods = _ref_quat()
    from svt_speechbrain_tpu.nnet.quaternion_networks import QLinear

    rng = np.random.default_rng(0)
    shape = (3, 7, 12) if ndim == 3 else (3, 12)
    ref = ref_mods["q_linear"].QLinear(
        n_neurons=5, input_shape=shape, bias=bias)
    _randomize_qlin(ref, rng, bias=bias)
    ours = QLinear(n_neurons=5, input_size=12, bias=bias)
    x = rng.normal(size=shape).astype(np.float32)
    want = ref(_torch(x)).detach().numpy()
    got = np.asarray(ours(_qlin_params(ref, bias=bias), jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("vector_scale", [False, True])
def test_qlinear_spinor_matches_reference(vector_scale):
    """The rotation (spinor) path: input-indexed rotation kernel, norm eps
    OUTSIDE the sqrt, scale gate only when vector_scale."""
    ref_mods = _ref_quat()
    from svt_speechbrain_tpu.nnet.quaternion_networks import QLinear

    rng = np.random.default_rng(1)
    shape = (3, 6, 12)
    ref = ref_mods["q_linear"].QLinear(
        n_neurons=5, input_shape=shape, bias=True, spinor=True,
        vector_scale=vector_scale)
    _randomize_qlin(ref, rng)
    ours = QLinear(n_neurons=5, input_size=12, bias=True, spinor=True,
                   vector_scale=vector_scale)
    x = rng.normal(size=shape).astype(np.float32)
    # spinor inputs are pure quaternions: zero the real block
    x[..., :3] = 0.0
    want = ref(_torch(x)).detach().numpy()
    got = np.asarray(ours(_qlin_params(ref), jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def _qconv_params(ref, bias=True, ndim=1):
    tr = (2, 1, 0) if ndim == 1 else (3, 2, 1, 0)
    p = {c: {"w": jnp.asarray(
            getattr(ref, f"{c}_weight").detach().numpy().transpose(tr))}
         for c in "rijk"}
    if bias:
        p["bias"] = jnp.asarray(ref.b.detach().numpy())
    return p


def _randomize_qconv(ref, rng, bias=True):
    import torch

    with torch.no_grad():
        for c in "rijk":
            w = getattr(ref, f"{c}_weight")
            w.copy_(_torch(0.5 * rng.normal(
                size=w.shape).astype(np.float32)))
        if bias and ref.b is not None:
            ref.b.copy_(_torch(rng.normal(
                size=ref.b.shape).astype(np.float32)))


@pytest.mark.parametrize("padding,stride,dilation", [
    ("same", 1, 1), ("same", 2, 1), ("valid", 1, 1), ("causal", 1, 2)])
def test_qconv1d_matches_reference(padding, stride, dilation):
    ref_mods = _ref_quat()
    from svt_speechbrain_tpu.nnet.quaternion_networks import QConv1d

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 18, 8)).astype(np.float32)
    ref = ref_mods["q_CNN"].QConv1d(
        out_channels=3, kernel_size=3, input_shape=x.shape,
        stride=stride, dilation=dilation, padding=padding)
    _randomize_qconv(ref, rng)
    ours = QConv1d(out_channels=3, kernel_size=3, input_size=8,
                   stride=stride, dilation=dilation, padding=padding)
    want = ref(_torch(x)).detach().numpy()
    got = np.asarray(ours(_qconv_params(ref), jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_qconv1d_spinor_matches_reference():
    """Conv rotation: output-indexed rotation kernel, norm eps INSIDE the
    sqrt — the transposed twin of the linear spinor."""
    ref_mods = _ref_quat()
    from svt_speechbrain_tpu.nnet.quaternion_networks import QConv1d

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 14, 8)).astype(np.float32)
    x[..., :2] = 0.0
    ref = ref_mods["q_CNN"].QConv1d(
        out_channels=3, kernel_size=3, input_shape=x.shape, spinor=True)
    _randomize_qconv(ref, rng)
    ours = QConv1d(out_channels=3, kernel_size=3, input_size=8, spinor=True)
    want = ref(_torch(x)).detach().numpy()
    got = np.asarray(ours(_qconv_params(ref), jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_qconv2d_matches_reference_axis_mapping():
    ref_mods = _ref_quat()
    from svt_speechbrain_tpu.nnet.quaternion_networks import QConv2d

    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 11, 9, 8)).astype(np.float32)  # (B, T, F, 4C)
    ref = ref_mods["q_CNN"].QConv2d(
        out_channels=3, kernel_size=(3, 5), input_shape=x.shape,
        stride=(1, 2), padding="same")
    _randomize_qconv(ref, rng)
    ours = QConv2d(out_channels=3, kernel_size=(3, 5), input_size=8,
                   stride=(1, 2), padding="same")
    want = ref(_torch(x)).detach().numpy()
    got = np.asarray(ours(_qconv_params(ref, ndim=2), jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("momentum", [0.1, None])
def test_qbatchnorm_trajectory_matches_reference(momentum):
    """2-D train trajectory (uncentered divide + running-stat updates) and
    the variance-divide eval quirk, golden vs the reference."""
    import torch

    ref_mods = _ref_quat()
    from svt_speechbrain_tpu.nnet.quaternion_networks import QBatchNorm

    rng = np.random.default_rng(5)
    ref = ref_mods["q_normalization"].QBatchNorm(
        input_size=8, momentum=momentum)
    with torch.no_grad():
        ref.gamma.copy_(_torch(rng.uniform(0.5, 1.5, 2).astype(np.float32)))
        ref.beta.copy_(_torch(rng.normal(size=8).astype(np.float32)))
    ours = QBatchNorm(input_size=8, momentum=momentum)
    params = {"gamma": jnp.asarray(ref.gamma.detach().numpy()),
              "beta": jnp.asarray(ref.beta.detach().numpy())}
    state = ours.init_state()

    ref.train()
    for _ in range(3):
        x = rng.normal(size=(6, 8)).astype(np.float32) * 1.5 + 0.3
        want = ref(_torch(x)).detach().numpy()
        got, state = ours(params, state, jnp.asarray(x), train=True)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    np.testing.assert_allclose(np.asarray(state["running_mean"]),
                               ref.running_mean.detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(state["running_var"]),
                               ref.running_var.detach().numpy(), atol=1e-6)

    ref.eval()
    x = rng.normal(size=(5, 8)).astype(np.float32)
    want = ref(_torch(x)).detach().numpy()
    got, _ = ours(params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def _qrnn_layer_params(ref_layer, proj_bias):
    return {"w": _qlin_params(ref_layer.w, bias=proj_bias),
            "u": _qlin_params(ref_layer.u, bias=proj_bias)}


def _randomize_qrnn(ref, rng, proj_bias):
    for lay in ref.rnn:
        _randomize_qlin(lay.w, rng, bias=proj_bias, scale=0.3)
        _randomize_qlin(lay.u, rng, bias=proj_bias, scale=0.3)


@pytest.mark.parametrize("bidirectional", [False, True])
def test_qrnn_matches_reference(bidirectional):
    ref_mods = _ref_quat()
    from svt_speechbrain_tpu.nnet.quaternion_networks import QRNN

    rng = np.random.default_rng(6)
    x = rng.normal(size=(3, 8, 8)).astype(np.float32)
    ref = ref_mods["q_RNN"].QRNN(
        hidden_size=2, input_shape=x.shape, num_layers=2,
        bidirectional=bidirectional)
    ref.eval()
    _randomize_qrnn(ref, rng, proj_bias=False)
    ours = QRNN(hidden_size=2, input_size=8, num_layers=2,
                bidirectional=bidirectional)
    params = {f"l{i}": _qrnn_layer_params(ref.rnn[i], False)
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
def test_qlstm_matches_reference(bidirectional):
    """Pins the contiguous chunk(16)+cat gate slicing (q_RNN.py:329-353)."""
    ref_mods = _ref_quat()
    from svt_speechbrain_tpu.nnet.quaternion_networks import QLSTM

    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 7, 8)).astype(np.float32)
    ref = ref_mods["q_RNN"].QLSTM(
        hidden_size=2, input_shape=x.shape, num_layers=2,
        bidirectional=bidirectional)
    ref.eval()
    _randomize_qrnn(ref, rng, proj_bias=True)
    ours = QLSTM(hidden_size=2, input_size=8, num_layers=2,
                 bidirectional=bidirectional)
    params = {f"l{i}": _qrnn_layer_params(ref.rnn[i], True)
              for i in range(2)}
    want_out, want_h = ref(_torch(x))
    got_out, got_h = ours(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_out),
                               want_out.detach().numpy(),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_h),
                               want_h.detach().numpy(),
                               rtol=1e-5, atol=1e-4)


def test_qligru_batchnorm_matches_reference():
    """The QLiGRU wrapper is ALWAYS batchnorm (it never forwards a
    normalization arg to its layers): stateful QBatchNorm on the flattened
    projection, train + eval golden."""
    import torch

    ref_mods = _ref_quat()
    from svt_speechbrain_tpu.nnet.quaternion_networks import QLiGRU

    rng = np.random.default_rng(8)
    x = rng.normal(size=(3, 6, 8)).astype(np.float32)
    ref = ref_mods["q_RNN"].QLiGRU(
        hidden_size=2, input_shape=x.shape, num_layers=2,
        bidirectional=True)
    _randomize_qrnn(ref, rng, proj_bias=False)
    ours = QLiGRU(hidden_size=2, input_size=8, num_layers=2,
                  bidirectional=True)
    params = {f"l{i}": _qrnn_layer_params(ref.rnn[i], False)
              for i in range(2)}
    state = ours.init_state()
    for i in range(2):
        n = ref.rnn[i].norm
        with torch.no_grad():
            n.gamma.copy_(_torch(rng.uniform(
                0.5, 1.5, n.gamma.shape).astype(np.float32)))
            n.beta.copy_(_torch(rng.normal(
                size=n.beta.shape).astype(np.float32)))
            n.running_mean.copy_(_torch(rng.normal(
                size=n.running_mean.shape).astype(np.float32) * 0.1))
            n.running_var.copy_(_torch(rng.uniform(
                0.5, 1.5, n.running_var.shape).astype(np.float32)))
        params[f"l{i}"]["norm"] = {
            "gamma": jnp.asarray(n.gamma.detach().numpy()),
            "beta": jnp.asarray(n.beta.detach().numpy())}
        state[f"l{i}"] = {
            "num_batches_tracked": jnp.asarray(
                int(n.num_batches_tracked), jnp.int32),
            "running_mean": jnp.asarray(n.running_mean.detach().numpy()),
            "running_var": jnp.asarray(n.running_var.detach().numpy())}

    ref.train()
    want_out, _ = ref(_torch(x))
    (got_out, _), state = ours(params, state, jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(got_out),
                               want_out.detach().numpy(),
                               rtol=1e-5, atol=1e-4)
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(state[f"l{i}"]["running_var"]),
            ref.rnn[i].norm.running_var.detach().numpy(), atol=1e-6)

    ref.eval()
    want_out, want_h = ref(_torch(x))
    (got_out, got_h), _ = ours(params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got_out),
                               want_out.detach().numpy(),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_h),
                               want_h.detach().numpy(),
                               rtol=1e-5, atol=1e-4)


def test_qligru_layer_no_norm_matches_reference():
    """QLiGRU_Layer with a non-batchnorm normalization string applies NO
    normalization (q_RNN.py:1075 — unlike the complex CLiGRU whose
    fallback applies CLayerNorm)."""
    ref_mods = _ref_quat()
    from svt_speechbrain_tpu.nnet.quaternion_networks import QLiGRU

    rng = np.random.default_rng(9)
    x = rng.normal(size=(2, 5, 8)).astype(np.float32)
    ref_layer = ref_mods["q_RNN"].QLiGRU_Layer(
        input_size=8, hidden_size=8, num_layers=1, batch_size=2,
        normalization="nope", bidirectional=False)
    ref_layer.eval()
    _randomize_qlin(ref_layer.w, rng, bias=False, scale=0.3)
    _randomize_qlin(ref_layer.u, rng, bias=False, scale=0.3)
    ours = QLiGRU(hidden_size=2, input_size=8, num_layers=1,
                  normalization="nope")
    params = {"l0": {"w": _qlin_params(ref_layer.w, bias=False),
                     "u": _qlin_params(ref_layer.u, bias=False)}}
    want = ref_layer(_torch(x)).detach().numpy()
    (got, _), _ = ours(params, ours.init_state(), jnp.asarray(x),
                       train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-4)
