"""Golden parity for the Conv-TasNet stack vs the reference torch code
(``speechbrain/lobes/models/conv_tasnet.py``): Encoder (strided same-pad
reflect conv), MaskNet (cLN → bottleneck → R×X dilated TemporalBlocks with
PReLU + gLN/cLN → relu/softmax masks), Decoder (linear basis signals +
50%-overlap-add), and the full separator chain.

Layout note: the reference MaskNet is channel-first ((M, N, K) →
(C, M, N, K)); ours is channel-last ((M, K, N) → (M, K, C, N)) per the
repo convention — the tests transpose at the boundary and assert the
numerics are weight-exact.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import import_reference_speechbrain, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")


def _np(t):
    return t.detach().numpy()


def _conv_w(sb_conv):
    # torch conv1d weight (out, in/groups, k) -> ours (k, in/groups, out)
    return jnp.asarray(_np(sb_conv.conv.weight).transpose(2, 1, 0))


def _norm_p(ref_norm):
    return {"scale": jnp.asarray(_np(ref_norm.gamma).ravel()),
            "bias": jnp.asarray(_np(ref_norm.beta).ravel())}


def _prelu_p(ref_act):
    return {"alpha": jnp.asarray(_np(ref_act.weight))}


def _randomize(ref_masknet, rng):
    import torch

    with torch.no_grad():
        for m in ref_masknet.modules():
            if hasattr(m, "gamma"):
                m.gamma.copy_(torch.tensor(rng.uniform(
                    0.5, 1.5, m.gamma.shape).astype(np.float32)))
                m.beta.copy_(torch.tensor(rng.normal(
                    size=m.beta.shape).astype(np.float32)))
            if isinstance(m, torch.nn.PReLU):
                m.weight.copy_(torch.tensor(rng.uniform(
                    0.05, 0.5, m.weight.shape).astype(np.float32)))


def _convert_masknet(ref):
    params = {"layer_norm": _norm_p(ref.layer_norm),
              "bottleneck": {"w": _conv_w(ref.bottleneck_conv1x1)},
              "mask_conv": {"w": _conv_w(ref.mask_conv1x1)}}
    for i, (name, tb) in enumerate(ref.temporal_conv_net.items()):
        ds = tb.layers["DSconv"]
        params[f"block{i}"] = {
            "conv_in": {"w": _conv_w(tb.layers["conv"])},
            "act": _prelu_p(tb.layers["act"]),
            "norm": _norm_p(tb.layers["norm"]),
            "dsconv": {
                "dconv": {"w": _conv_w(ds["conv_0"])},
                "act": _prelu_p(ds["act"]),
                "norm": _norm_p(ds["act_0"]),
                "pconv": {"w": _conv_w(ds["conv_1"])},
            },
        }
    return params


@pytest.mark.parametrize("L", [11, 16])
def test_encoder_matches_reference(L):
    import torch

    import_reference_speechbrain()
    from svt_speechbrain_tpu.models.separation import ConvTasNetEncoder
    from speechbrain.lobes.models import conv_tasnet as ctn

    torch.manual_seed(0)
    ref = ctn.Encoder(L, 20)
    ours = ConvTasNetEncoder(L, 20)
    params = {"conv": {"w": _conv_w(ref.conv1d_U)}}

    wav = np.random.default_rng(0).normal(size=(3, 500)).astype(np.float32)
    want = _np(ref(torch.tensor(wav)))
    got = np.asarray(ours(params, jnp.asarray(wav)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-6)


@pytest.mark.parametrize("norm_type,mask_nonlinear", [
    ("gLN", "relu"), ("cLN", "softmax")])
def test_masknet_matches_reference(norm_type, mask_nonlinear):
    import torch

    import_reference_speechbrain()
    from svt_speechbrain_tpu.models.separation import MaskNet
    from speechbrain.lobes.models import conv_tasnet as ctn

    N, B, H, P, X, R, C = 12, 8, 10, 3, 3, 2, 2
    torch.manual_seed(1)
    ref = ctn.MaskNet(N, B, H, P, X, R, C, norm_type=norm_type,
                      mask_nonlinear=mask_nonlinear)
    _randomize(ref, np.random.default_rng(2))
    ref.eval()
    ours = MaskNet(N, B, H, P, X, R, C, norm_type=norm_type,
                   mask_nonlinear=mask_nonlinear)
    params = _convert_masknet(ref)

    mixture_w = np.random.default_rng(3).normal(
        size=(4, N, 40)).astype(np.float32)  # reference layout (M, N, K)
    with torch.no_grad():
        want = _np(ref(torch.tensor(mixture_w)))  # (C, M, N, K)
    got = np.asarray(ours(params, jnp.asarray(
        mixture_w.transpose(0, 2, 1))))  # ours: (M, K, N) -> (M, K, C, N)
    got_ref_layout = got.transpose(2, 0, 3, 1)  # -> (C, M, N, K)
    np.testing.assert_allclose(got_ref_layout, want, atol=2e-5)


def test_decoder_matches_reference():
    import torch

    import_reference_speechbrain()
    from svt_speechbrain_tpu.models.separation import ConvTasNetDecoder
    from speechbrain.lobes.models import conv_tasnet as ctn

    L, C, N = 8, 2, 8
    torch.manual_seed(2)
    ref = ctn.Decoder(L, N)
    ours = ConvTasNetDecoder(L, N)
    params = {"basis_signals": {
        "w": jnp.asarray(_np(ref.basis_signals.w.weight).T)}}

    rng = np.random.default_rng(4)
    mixture_w = rng.normal(size=(5, 30, N)).astype(np.float32)
    est_mask = rng.normal(size=(5, 30, C, N)).astype(np.float32)
    with torch.no_grad():
        want = _np(ref(torch.tensor(mixture_w), torch.tensor(est_mask)))
    got = np.asarray(ours(params, jnp.asarray(mixture_w),
                          jnp.asarray(est_mask)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_full_chain_matches_reference():
    """Encoder → MaskNet → Decoder composed exactly like the reference
    modules would be in a separation recipe."""
    import torch

    import_reference_speechbrain()
    from svt_speechbrain_tpu.models.separation import ConvTasNet
    from speechbrain.lobes.models import conv_tasnet as ctn

    L, N, B, H, P, X, R, C = 16, 12, 8, 10, 3, 2, 2, 2
    torch.manual_seed(3)
    ref_enc = ctn.Encoder(L, N)
    ref_mask = ctn.MaskNet(N, B, H, P, X, R, C)
    ref_dec = ctn.Decoder(L, N)
    _randomize(ref_mask, np.random.default_rng(5))
    ref_mask.eval()

    ours = ConvTasNet(n_sources=C, enc_kernel=L, enc_channels=N,
                      bn_channels=B, hidden=H, n_blocks=X, n_repeats=R)
    params = {"encoder": {"conv": {"w": _conv_w(ref_enc.conv1d_U)}},
              "masknet": _convert_masknet(ref_mask),
              "decoder": {"basis_signals": {
                  "w": jnp.asarray(_np(ref_dec.basis_signals.w.weight).T)}}}

    wav = np.random.default_rng(6).normal(size=(2, 800)).astype(np.float32)
    with torch.no_grad():
        mix_w = ref_enc(torch.tensor(wav))                      # (M, K, N)
        est_mask = ref_mask(mix_w.permute(0, 2, 1))             # (C, M, N, K)
        want = _np(ref_dec(mix_w, est_mask.permute(1, 3, 0, 2)))  # (M, T, C)

    got = np.asarray(ours(params, jnp.asarray(wav)))  # (M, C, T)
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, atol=2e-5)


@pytest.mark.parametrize("frames,frame_length,frame_step", [
    (30, 8, 4), (10, 16, 8), (5, 20, 20), (7, 12, 9)])
def test_overlap_and_add_matches_reference(frames, frame_length, frame_step):
    """The jax overlap_and_add vs the reference's torch implementation
    (signal_processing.py:430) — overlapping, non-overlapping, and
    non-divisible step cases. (The jax version indexed one row per output
    subframe instead of one per frame — wrong for any overlap.)"""
    import torch

    sb = import_reference_speechbrain()
    from svt_speechbrain_tpu.processing.signal_processing import \
        overlap_and_add

    sig = np.random.default_rng(7).normal(
        size=(3, 2, frames, frame_length)).astype(np.float32)
    want = _np(sb.processing.signal_processing.overlap_and_add(
        torch.tensor(sig), frame_step))
    got = np.asarray(overlap_and_add(jnp.asarray(sig), frame_step))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-6)
