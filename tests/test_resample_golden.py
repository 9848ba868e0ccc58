"""Golden parity for the kaldi-compatible resampler vs the reference
``speechbrain/processing/speech_augmentation.py`` ``Resample``: output
lengths (tick math) and waveform values across up/down/rational rates,
2-D and channeled 3-D inputs, plus SpeedPerturb's resampling core."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.conftest import import_reference_speechbrain, reference_available

from svt_speechbrain_tpu.processing.speech_augmentation import (Resample,
                                                                SpeedPerturb)

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference checkout not present")


def _ref_mod():
    import_reference_speechbrain()
    from speechbrain.processing import speech_augmentation as ref
    return ref


@pytest.mark.parametrize("orig,new", [
    (16000, 8000), (8000, 16000), (16000, 22050), (16000, 24000),
    (22050, 16000), (16000, 16000)])
def test_resample_matches_reference(orig, new):
    ref_mod = _ref_mod()
    rng = np.random.default_rng(0)
    wav = rng.normal(size=(2, 3200)).astype(np.float32)
    with torch.no_grad():
        ref = ref_mod.Resample(orig_freq=orig, new_freq=new)(
            torch.tensor(wav)).numpy()
    ours = np.asarray(Resample(orig_freq=orig, new_freq=new)(
        None, jnp.asarray(wav)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=3e-4)


def test_resample_channels_matches_reference():
    ref_mod = _ref_mod()
    rng = np.random.default_rng(1)
    wav = rng.normal(size=(2, 1600, 3)).astype(np.float32)
    with torch.no_grad():
        ref = ref_mod.Resample(16000, 8000)(torch.tensor(wav)).numpy()
    ours = np.asarray(Resample(16000, 8000)(None, jnp.asarray(wav)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=3e-4)


def test_speed_perturb_core_matches_reference():
    """SpeedPerturb at a fixed speed: our static-shape variant cuts/pads to
    the input length (documented deviation); the resampled PREFIX must be
    identical to the reference's output."""
    ref_mod = _ref_mod()
    rng = np.random.default_rng(2)
    wav = rng.normal(size=(2, 3200)).astype(np.float32)
    with torch.no_grad():
        ref_sp = ref_mod.SpeedPerturb(orig_freq=16000, speeds=[90])
        ref = ref_sp(torch.tensor(wav)).numpy()
    ours_full = np.asarray(Resample(16000, 16000 * 90 // 100)(
        None, jnp.asarray(wav)))
    m = min(ref.shape[1], ours_full.shape[1])
    np.testing.assert_allclose(ours_full[:, :m], ref[:, :m], atol=3e-4)

    import jax

    sp = SpeedPerturb(orig_freq=16000, speeds=[90])
    out = np.asarray(sp(None, jnp.asarray(wav), rng=jax.random.PRNGKey(0)))
    assert out.shape == wav.shape                  # static-shape contract
    np.testing.assert_allclose(out[:, :m], ref[:, :m], atol=3e-4)
