"""Golden parity for the STOI loss vs the reference torch implementation.

The reference (`speechbrain/nnet/loss/stoi_loss.py`) leans on torchaudio
for its 16k->10k resample and power spectrogram; torchaudio is absent from
this image, so the test supplies faithful stubs:

- ``torchaudio.transforms.Resample`` -> the reference's OWN
  `speechbrain.processing.speech_augmentation.Resample` (the same
  compliance-kaldi windowed-sinc algorithm torchaudio's transform used at
  speechbrain 0.5.x — the reference class even documents itself as "a
  modification of the resample function from torchaudio").
- ``torchaudio.transforms.Spectrogram`` -> torch.stft with torchaudio's
  documented defaults (centered, reflect pad, periodic Hann of
  win_length, |.|^power).

Everything else on the golden side runs the reference's actual code.
"""
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

import torch

from tests.conftest import import_reference_speechbrain, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference checkout not present")


def _install_torchaudio_transforms():
    import_reference_speechbrain()
    from speechbrain.processing.speech_augmentation import Resample as SBRes

    class Resample(torch.nn.Module):
        def __init__(self, orig_freq, new_freq):
            super().__init__()
            self.inner = SBRes(orig_freq=orig_freq, new_freq=new_freq)

        def forward(self, x):
            return self.inner(x.unsqueeze(0)).squeeze(0)

    class Spectrogram(torch.nn.Module):
        def __init__(self, n_fft=400, win_length=None, hop_length=None,
                     power=2):
            super().__init__()
            self.n_fft, self.power = n_fft, power
            self.win_length = win_length or n_fft
            self.hop_length = hop_length or self.win_length // 2

        def forward(self, x):
            spec = torch.stft(
                x, n_fft=self.n_fft, hop_length=self.hop_length,
                win_length=self.win_length,
                window=torch.hann_window(self.win_length),
                center=True, pad_mode="reflect", normalized=False,
                onesided=True, return_complex=True)
            return spec.abs() ** self.power

    ta = sys.modules["torchaudio"]
    tr = types.ModuleType("torchaudio.transforms")
    tr.Resample, tr.Spectrogram = Resample, Spectrogram
    ta.transforms = tr
    sys.modules["torchaudio.transforms"] = tr


def _ref_stoi():
    _install_torchaudio_transforms()
    import speechbrain.nnet.loss.stoi_loss as ref_mod
    return ref_mod


def _signals():
    """16 kHz batch with tonal content, noise, and genuinely silent spans
    (exercises removeSilentFrames) plus ragged relative lengths."""
    rng = np.random.default_rng(0)
    t = np.arange(14000) / 16000.0
    clean = np.stack([
        np.sin(2 * np.pi * 440 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t)),
        np.sign(np.sin(2 * np.pi * 220 * t)) * 0.5,
        np.sin(2 * np.pi * 880 * t) * (np.cos(2 * np.pi * 1.5 * t) ** 2),
    ]).astype(np.float32)
    clean[0, 2000:4500] = 0.0            # silent span -> frames dropped
    clean[2, :1500] = 0.0
    noise = rng.normal(size=clean.shape).astype(np.float32)
    pred = clean + np.array([0.4, 0.05, 0.9], np.float32)[:, None] * noise
    lens = np.array([1.0, 0.83, 0.61], np.float32)
    return pred, clean, lens


def test_thirdoct_matches_reference():
    ref_mod = _ref_stoi()
    from svt_speechbrain_tpu.nnet.loss.stoi_loss import thirdoct

    ref_obm = ref_mod.thirdoct(fs=10000, nfft=512, num_bands=15,
                               min_freq=150).numpy()
    our_obm, cf = thirdoct(10000, 512, 15, 150)
    np.testing.assert_array_equal(our_obm, ref_obm)
    assert len(cf) == 15


def test_remove_silent_frames_matches_reference():
    ref_mod = _ref_stoi()
    from svt_speechbrain_tpu.nnet.loss.stoi_loss import removeSilentFrames

    rng = np.random.default_rng(1)
    x = rng.normal(size=3000).astype(np.float32) * 0.5
    x[700:1600] *= 1e-4                   # a quiet stretch
    y = rng.normal(size=3000).astype(np.float32)
    ref_x, ref_y = ref_mod.removeSilentFrames(torch.tensor(x),
                                              torch.tensor(y))
    our_x, our_y = removeSilentFrames(x, y)
    np.testing.assert_allclose(np.asarray(our_x), ref_x.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(our_y), ref_y.numpy(), atol=1e-5)


@pytest.mark.parametrize("reduction", ["mean", "batch"])
def test_stoi_loss_matches_reference(reduction):
    ref_mod = _ref_stoi()
    from svt_speechbrain_tpu.nnet.loss.stoi_loss import stoi_loss

    pred, clean, lens = _signals()
    with torch.no_grad():
        ref = ref_mod.stoi_loss(torch.tensor(pred), torch.tensor(clean),
                                torch.tensor(lens), reduction=reduction)
    ours = stoi_loss(jnp.asarray(pred), jnp.asarray(clean), lens,
                     reduction=reduction)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-4)
