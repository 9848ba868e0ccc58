"""Golden parity for NMF separation/resynthesis vs the reference
``speechbrain/processing/NMF.py`` (torch CPU, imported with the stub
harness). The activation init is injected on both sides (the reference
draws ``0.1*torch.rand`` internally — monkeypatched) so the multiplicative
update trajectories are directly comparable."""
import numpy as np
import pytest

from tests.conftest import import_reference_speechbrain, reference_available

from svt_speechbrain_tpu.processing.nmf import (NMF_separate_spectra,
                                                reconstruct_results)

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference checkout not present")


def _inputs(bs=2, f=11, t=20, k1=4, k2=3, seed=0):
    rng = np.random.default_rng(seed)
    w1 = rng.random((f, k1)).astype(np.float32)
    w2 = rng.random((f, k2)).astype(np.float32)
    xmix = rng.random((bs, t, f)).astype(np.float32) + 0.1   # (BS, T, F)
    h0 = (0.1 * rng.random((k1 + k2, bs * t))).astype(np.float32)
    return w1, w2, xmix, h0


def test_nmf_separate_spectra_matches_reference(monkeypatch):
    import_reference_speechbrain()
    import torch
    from speechbrain.processing import NMF as ref_mod

    w1, w2, xmix, h0 = _inputs()
    monkeypatch.setattr(ref_mod.torch, "rand",
                        lambda *shape: torch.from_numpy(h0.copy() / 0.1))
    ref_x1, ref_x2 = ref_mod.NMF_separate_spectra(
        [torch.from_numpy(w1), torch.from_numpy(w2)],
        torch.from_numpy(xmix))

    our_x1, our_x2 = NMF_separate_spectra((w1, w2), xmix, h_init=h0)
    np.testing.assert_allclose(our_x1, ref_x1.numpy(), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(our_x2, ref_x2.numpy(), rtol=1e-3, atol=1e-5)


def test_nmf_reconstruct_results_matches_reference():
    import_reference_speechbrain()
    import torch
    from speechbrain.processing import NMF as ref_mod

    rng = np.random.default_rng(1)
    bs, f, t = 2, 201, 30           # f matches a 25 ms/16 kHz STFT (n_fft 400)
    x1 = rng.random((bs, f, t)).astype(np.float32)
    x2 = rng.random((bs, f, t)).astype(np.float32)
    x_stft = rng.normal(size=(bs, f, t, 2)).astype(np.float32)

    ref1, ref2 = ref_mod.reconstruct_results(
        torch.from_numpy(x1), torch.from_numpy(x2), torch.from_numpy(x_stft),
        16000, 25, 10)
    our1, our2 = reconstruct_results(x1, x2, x_stft, 16000, 25, 10)

    assert len(our1) == len(ref1) == bs
    for ours, refs in ((our1, ref1), (our2, ref2)):
        for o, r in zip(ours, refs):
            r = r.numpy()
            assert o.shape == r.shape
            np.testing.assert_allclose(o, r, rtol=1e-3, atol=1e-4)
