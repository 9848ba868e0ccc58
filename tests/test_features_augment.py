"""DSP features vs torch.stft, augmentation behaviour."""
import numpy as np
import pytest

import jax.numpy as jnp
import jax

from svt_speechbrain_tpu.processing.features import (
    STFT, ISTFT, spectral_magnitude, Filterbank, DCT, Deltas, ContextWindow,
    InputNormalization,
)
from svt_speechbrain_tpu.models.features import Fbank, MFCC


def test_stft_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    wav = rng.normal(size=(2, 16000)).astype(np.float32)
    stft = STFT(sample_rate=16000, win_length=25, hop_length=10, n_fft=400)
    got = np.asarray(stft(None, wav))  # (B, frames, F, 2)

    window = torch.hamming_window(400)
    expected = torch.stft(torch.tensor(wav), 400, 160, 400, window,
                          center=True, pad_mode="constant", onesided=True,
                          return_complex=True)
    expected = torch.view_as_real(expected).numpy().transpose(0, 2, 1, 3)
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=2e-3)


def test_istft_roundtrip():
    rng = np.random.default_rng(1)
    wav = rng.normal(size=(1, 8000)).astype(np.float32)
    stft = STFT(sample_rate=16000, win_length=25, hop_length=10, n_fft=400,
                )
    istft = ISTFT(sample_rate=16000, win_length=25, hop_length=10, n_fft=400)
    rec = np.asarray(istft(None, stft(None, wav), sig_length=8000))
    # interior reconstruction is accurate (edges depend on window coverage)
    np.testing.assert_allclose(rec[0, 400:7600], wav[0, 400:7600], atol=1e-3)


def test_fbank_mfcc_shapes():
    rng = np.random.default_rng(2)
    wav = rng.normal(size=(2, 16000)).astype(np.float32)
    fb = Fbank(n_mels=40)(None, wav)
    assert fb.shape == (2, 101, 40)
    mf = MFCC(n_mels=23, n_mfcc=20)(None, wav)  # deltas+context default
    assert mf.shape == (2, 101, 20 * 3 * 11)
    assert np.isfinite(np.asarray(mf)).all()


def test_filterbank_triangular_rows_sum_positive():
    fb = Filterbank(n_mels=40, n_fft=400, sample_rate=16000, log_mel=False)
    mat = np.asarray(fb._filter_matrix())
    assert mat.shape == (201, 40)
    assert (mat >= 0).all()
    assert (mat.sum(0) > 0).all()


def test_context_window_and_deltas():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 30, 8)).astype(np.float32)
    cw = ContextWindow(left_frames=2, right_frames=2)(None, x)
    assert cw.shape == (2, 30, 8 * 5)
    d = Deltas(input_size=8)(None, x)
    assert d.shape == x.shape


def test_input_normalization_sentence():
    norm = InputNormalization(norm_type="sentence")
    state = norm.init_state()
    rng = np.random.default_rng(4)
    x = (rng.normal(size=(3, 20, 5)) * 4 + 2).astype(np.float32)
    y, _ = norm(None, state, x, lengths=np.ones(3))
    assert abs(float(np.asarray(y).mean())) < 1e-4


def test_augmentations_shapes_and_noop():
    from svt_speechbrain_tpu.processing.speech_augmentation import (
        AddNoise, AddBabble, DropFreq, DropChunk, DoClip, SpeedPerturb,
    )
    from svt_speechbrain_tpu.models.augment import SpecAugment, TimeDomainSpecAugment

    rng_np = np.random.default_rng(5)
    wav = jnp.asarray(rng_np.normal(size=(4, 8000)), jnp.float32)
    key = jax.random.PRNGKey(0)
    for aug in [AddNoise(snr_low=0, snr_high=10), AddBabble(),
                DropFreq(), DropChunk(drop_length_high=500), DoClip(),
                SpeedPerturb(16000, speeds=[90, 100, 110])]:
        out = aug(None, wav, rng=key) if "lengths" not in aug.__call__.__code__.co_varnames \
            else aug(None, wav, lengths=jnp.ones(4), rng=key)
        assert out.shape == wav.shape
        assert np.isfinite(np.asarray(out)).all()
        # no-op without rng
        assert np.allclose(np.asarray(aug(None, wav)), np.asarray(wav))

    spec = jnp.asarray(rng_np.normal(size=(2, 60, 40)), jnp.float32)
    sa = SpecAugment(time_warp=True, freq_mask=True, time_mask=True)
    out = sa(None, spec, rng=key)
    assert out.shape == spec.shape
    # some positions masked to zero
    assert (np.asarray(out) == 0).sum() > 0

    td = TimeDomainSpecAugment(sample_rate=16000)
    out = td(None, wav, lengths=jnp.ones(4), rng=key)
    assert out.shape == wav.shape


def test_fbank_matches_reference_torch():
    """Golden parity of our Fbank vs the reference speechbrain Fbank
    (STFT → power spectrum → mel filterbank → log) on real-ish audio."""
    import pytest
    from tests.conftest import import_reference_speechbrain, reference_available

    if not reference_available():
        pytest.skip("reference checkout not present")
    import torch

    import importlib

    import_reference_speechbrain()
    feats_mod = importlib.import_module("speechbrain.lobes.features")
    from svt_speechbrain_tpu.models.features import Fbank

    rng = np.random.default_rng(3)
    wav = (np.sin(np.arange(16000) * 0.05)
           + 0.3 * rng.normal(size=16000)).astype(np.float32)[None]

    import unittest.mock

    # the reference Deltas buffer hardcodes .cuda() at construction
    # (processing/features.py:817) — neutralize for CPU golden comparison
    with unittest.mock.patch.object(torch.Tensor, "cuda",
                                    lambda self, *a, **k: self):
        ref = feats_mod.Fbank(n_mels=40)
    ref.eval()
    with torch.no_grad():
        want = ref(torch.tensor(wav)).numpy()
    mine = Fbank(n_mels=40)
    got = np.asarray(mine(None, jnp.asarray(wav)))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_mfcc_matches_reference_torch():
    import pytest
    from tests.conftest import import_reference_speechbrain, reference_available

    if not reference_available():
        pytest.skip("reference checkout not present")
    import torch

    import importlib

    import_reference_speechbrain()
    feats_mod = importlib.import_module("speechbrain.lobes.features")
    from svt_speechbrain_tpu.models.features import MFCC

    rng = np.random.default_rng(4)
    wav = (np.sin(np.arange(16000) * 0.03)
           + 0.2 * rng.normal(size=16000)).astype(np.float32)[None]

    import unittest.mock

    with unittest.mock.patch.object(torch.Tensor, "cuda",
                                    lambda self, *a, **k: self):
        ref = feats_mod.MFCC(n_mfcc=20, deltas=True, context=False)
    ref.eval()
    with torch.no_grad():
        want = ref(torch.tensor(wav)).numpy()
    mine = MFCC(n_mfcc=20, deltas=True, context=False)
    got = np.asarray(mine(None, jnp.asarray(wav)))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-2)


def test_context_window_matches_reference():
    """ContextWindow layout is the reference's feature-major interleave with
    ZERO padding (grouped identity conv), bit-exact."""
    import torch

    from tests.conftest import import_reference_speechbrain, reference_available
    if not reference_available():
        pytest.skip("reference checkout not present")
    import_reference_speechbrain()
    from speechbrain.processing.features import ContextWindow as RefCW

    from svt_speechbrain_tpu.processing.features import ContextWindow

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 30, 5)).astype(np.float32)
    for left, right in ((5, 5), (3, 1), (0, 4), (2, 0)):
        with torch.no_grad():
            ref = RefCW(left_frames=left, right_frames=right)(
                torch.tensor(x)).numpy()
        ours = np.asarray(ContextWindow(left_frames=left, right_frames=right)(
            None, jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_fbank_context_deltas_matches_reference():
    """Full Fbank with context and deltas enabled (the reference recipes'
    default feature stack) matches end to end."""
    import torch

    from tests.conftest import import_reference_speechbrain, reference_available
    if not reference_available():
        pytest.skip("reference checkout not present")
    import_reference_speechbrain()
    from speechbrain.processing import features as rfeat

    orig = rfeat.Deltas.__init__

    def patched(self, *a, **k):
        cuda = torch.Tensor.cuda
        torch.Tensor.cuda = lambda self_, *aa, **kk: self_
        try:
            orig(self, *a, **k)
        finally:
            torch.Tensor.cuda = cuda

    rfeat.Deltas.__init__ = patched
    try:
        from speechbrain.lobes.features import Fbank as RefFbank

        from svt_speechbrain_tpu.models.features import Fbank

        rng = np.random.default_rng(1)
        wav = (rng.normal(size=(2, 16000)) * 0.1).astype(np.float32)
        for ctx, deltas in ((True, True), (True, False)):
            with torch.no_grad():
                ref = RefFbank(n_mels=24, context=ctx, deltas=deltas)(
                    torch.tensor(wav)).numpy()
            ours = np.asarray(Fbank(n_mels=24, context=ctx, deltas=deltas)(
                None, jnp.asarray(wav)))
            np.testing.assert_allclose(ours, ref, atol=2e-4)
    finally:
        rfeat.Deltas.__init__ = orig
