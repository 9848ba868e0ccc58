"""Golden parity for AddNoise vs the reference
``speechbrain/processing/speech_augmentation.py``: the corpus-noise path
(pad_noise looping, short-noise padding, start_index slicing, amplitude
normalization) with both sides' batch loaders pinned to the same noise,
and the UNnormalized white-noise law."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.conftest import import_reference_speechbrain, reference_available

from svt_speechbrain_tpu.processing.speech_augmentation import AddNoise

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference checkout not present")


def _fixed_snr_pair(noise, noise_rel, **kwargs):
    import_reference_speechbrain()
    from speechbrain.processing.speech_augmentation import (AddNoise
                                                            as RefAddNoise)

    ref = RefAddNoise(csv_file="unused.csv", snr_low=5, snr_high=5,
                      mix_prob=1.0, **kwargs)
    ref.data_loader = object()       # skip CSV loader construction
    ref._load_noise_batch_of_size = lambda b: (
        torch.tensor(noise)[:b], torch.tensor(noise_rel)[:b])
    ours = AddNoise(csv_file="unused.csv", snr_low=5, snr_high=5,
                    mix_prob=1.0, **kwargs)
    ours._load_noise_batch_of_size = lambda b: (noise.copy()[:b],
                                                noise_rel.copy()[:b])
    return ref, ours


@pytest.mark.parametrize("pad_noise", [False, True])
def test_corpus_noise_matches_reference(pad_noise):
    rng = np.random.default_rng(0)
    wav = (rng.normal(size=(2, 2000)) * 0.3).astype(np.float32)
    lens = np.array([1.0, 0.7], np.float32)
    if pad_noise:
        # shorter noise than speech exercises the pad_noise looping
        noise = rng.normal(size=(2, 1500)).astype(np.float32)
        noise_rel = np.array([1.0, 0.8], np.float32)
    else:
        # NOTE: short noise + start_index > 0 + pad_noise=False CRASHES the
        # reference (it right-pads only to max_length then slices past the
        # end) — use covering noise, the regime the reference supports
        noise = rng.normal(size=(2, 2500)).astype(np.float32)
        noise_rel = np.array([1.0, 0.9], np.float32)

    ref, ours = _fixed_snr_pair(noise, noise_rel, pad_noise=pad_noise,
                                start_index=100)
    with torch.no_grad():
        ref_out = ref(torch.tensor(wav).clone(), torch.tensor(lens)).numpy()
    our_out = np.asarray(ours(None, jnp.asarray(wav), jnp.asarray(lens),
                              rng=jax.random.PRNGKey(0)))
    np.testing.assert_allclose(our_out, ref_out, atol=1e-5)


def test_corpus_noise_truncated_lengths_match_reference():
    """Length conversion truncates (.long()), never rounds: noise/speech
    relative lengths are chosen so ``rel * T`` lands at ``x.9`` in float32
    — rounding would shift the pad_noise loop, the start_index range, and
    the per-noise amplitude by one sample (reference ``:166``/``:198``)."""
    rng = np.random.default_rng(7)
    wav = (rng.normal(size=(2, 2000)) * 0.3).astype(np.float32)
    lens = np.array([1.0, 0.777], np.float32)          # 0.777*2000 = 1553.99994
    noise = rng.normal(size=(2, 1000)).astype(np.float32)
    noise_rel = np.array([0.8999, 0.7599], np.float32)  # *1000 -> 899.9, 759.9

    ref, ours = _fixed_snr_pair(noise, noise_rel, pad_noise=True,
                                start_index=50)
    with torch.no_grad():
        ref_out = ref(torch.tensor(wav).clone(), torch.tensor(lens)).numpy()
    our_out = np.asarray(ours(None, jnp.asarray(wav), jnp.asarray(lens),
                              rng=jax.random.PRNGKey(7)))
    np.testing.assert_allclose(our_out, ref_out, atol=1e-5)


def test_normalize_clipping_matches_reference():
    rng = np.random.default_rng(1)
    wav = (rng.normal(size=(2, 1000)) * 2.0).astype(np.float32)
    lens = np.ones(2, np.float32)
    noise = (rng.normal(size=(2, 1000)) * 3.0).astype(np.float32)
    noise_rel = np.ones(2, np.float32)
    ref, ours = _fixed_snr_pair(noise, noise_rel, start_index=0,
                                normalize=True)
    with torch.no_grad():
        ref_out = ref(torch.tensor(wav).clone(), torch.tensor(lens)).numpy()
    our_out = np.asarray(ours(None, jnp.asarray(wav), jnp.asarray(lens),
                              rng=jax.random.PRNGKey(0)))
    np.testing.assert_allclose(our_out, ref_out, atol=1e-5)
    assert np.abs(our_out).max() <= 1.0


def test_white_noise_law_matches_reference():
    """No corpus: the reference adds ``new_amp * randn`` UNnormalized.
    RNGs differ across frameworks, so verify the law: the residual equals
    new_noise_amplitude times the (recomputed) standard-normal draw."""
    from svt_speechbrain_tpu.processing.signal_processing import (
        compute_amplitude, dB_to_amplitude)

    rng = np.random.default_rng(2)
    wav = (rng.normal(size=(2, 1000)) * 0.3).astype(np.float32)
    lens = np.ones(2, np.float32)
    ours = AddNoise(snr_low=5, snr_high=5, mix_prob=1.0)
    key = jax.random.PRNGKey(3)
    out = np.asarray(ours(None, jnp.asarray(wav), jnp.asarray(lens), rng=key))

    _, _, k_noise, _ = jax.random.split(key, 4)
    draw = np.asarray(jax.random.normal(k_noise, wav.shape))
    factor = 1 / (np.asarray(dB_to_amplitude(jnp.asarray(5.0))) + 1)
    clean_amp = np.asarray(compute_amplitude(
        jnp.asarray(wav), jnp.asarray(lens[:, None] * wav.shape[1])))
    expected = wav * (1 - factor) + factor * clean_amp * draw
    np.testing.assert_allclose(out, expected, atol=1e-5)


@pytest.mark.parametrize("scale", [1.0, 0.8, 1.3])
def test_addreverb_matches_reference(scale):
    """AddReverb with a pinned RIR: convolution, avg-amplitude rescale and
    the rir_scale_factor linear interpolation all match the reference."""
    import_reference_speechbrain()
    from speechbrain.processing.speech_augmentation import (AddReverb
                                                            as RefAddReverb)

    from svt_speechbrain_tpu.processing.speech_augmentation import AddReverb

    rng = np.random.default_rng(0)
    wav = (rng.normal(size=(2, 2000)) * 0.3).astype(np.float32)
    rir = np.zeros((1, 300), np.float32)
    rir[0, 10] = 1.0
    rir[0, 60] = 0.4
    rir[0, 150] = 0.15

    ref = RefAddReverb.__new__(RefAddReverb)
    torch.nn.Module.__init__(ref)
    ref.reverb_prob = 1.0
    ref.rir_scale_factor = scale
    ref._load_rir = lambda w: torch.tensor(rir)[..., None]
    with torch.no_grad():
        ref_out = ref(torch.tensor(wav).clone(), torch.ones(2)).numpy()

    ours = AddReverb(rir_funct=lambda k: jnp.asarray(rir), reverb_prob=1.0,
                     rir_scale_factor=scale)
    our_out = np.asarray(ours(None, jnp.asarray(wav), jnp.ones(2),
                              rng=jax.random.PRNGKey(0)))
    np.testing.assert_allclose(our_out, ref_out, atol=1e-5)


def test_signal_primitives_match_reference():
    """notch_filter (Blackman-windowed sinc pair), convolve1d (direct and
    fft/rotated), compute_amplitude and rescale vs the reference."""
    import_reference_speechbrain()
    from speechbrain.processing import signal_processing as rsp

    from svt_speechbrain_tpu.processing import signal_processing as osp

    for freq, width, nwidth in ((0.2, 101, 0.05), (0.35, 75, 0.1),
                                (0.6, 51, 0.02)):
        r = rsp.notch_filter(freq, width, nwidth).numpy()
        o = np.asarray(osp.notch_filter(freq, width, nwidth))
        np.testing.assert_allclose(o, r, atol=1e-6)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 500, 1)).astype(np.float32)
    k = rng.normal(size=(1, 31, 1)).astype(np.float32)
    r = rsp.convolve1d(torch.tensor(x), torch.tensor(k), padding=15).numpy()
    o = np.asarray(osp.convolve1d(jnp.asarray(x), jnp.asarray(k), padding=15))
    np.testing.assert_allclose(o, r, atol=1e-5)
    r = rsp.convolve1d(torch.tensor(x), torch.tensor(k), use_fft=True,
                       rotation_index=5).numpy()
    o = np.asarray(osp.convolve1d(jnp.asarray(x), jnp.asarray(k),
                                  use_fft=True, rotation_index=5))
    np.testing.assert_allclose(o, r, atol=1e-5)

    x2 = rng.normal(size=(2, 500)).astype(np.float32)
    lens = np.array([[400.0], [500.0]], np.float32)
    for amp_type in ("avg", "peak"):
        r = rsp.compute_amplitude(torch.tensor(x2), torch.tensor(lens),
                                  amp_type=amp_type).numpy()
        o = np.asarray(osp.compute_amplitude(jnp.asarray(x2),
                                             jnp.asarray(lens),
                                             amp_type=amp_type))
        np.testing.assert_allclose(o, r, atol=1e-6)
    r = rsp.rescale(torch.tensor(x2), torch.tensor(lens), 0.5,
                    amp_type="avg").numpy()
    o = np.asarray(osp.rescale(jnp.asarray(x2), jnp.asarray(lens), 0.5,
                               amp_type="avg"))
    np.testing.assert_allclose(o, r, atol=1e-6)


@pytest.mark.parametrize("freq,count", [(0.3, 1), (0.5, 1), (0.4, 2)])
def test_dropfreq_pinned_matches_reference(freq, count):
    """DropFreq with pinned frequency/count: composed notch filters applied
    once, like the reference."""
    import_reference_speechbrain()
    from speechbrain.processing.speech_augmentation import (DropFreq
                                                            as RefDropFreq)

    from svt_speechbrain_tpu.processing.speech_augmentation import DropFreq

    rng = np.random.default_rng(0)
    wav = (rng.normal(size=(2, 4000)) * 0.5).astype(np.float32)
    kw = dict(drop_freq_low=freq, drop_freq_high=freq, drop_count_low=count,
              drop_count_high=count, drop_width=0.05, drop_prob=1.0)
    with torch.no_grad():
        ref_out = RefDropFreq(**kw)(torch.tensor(wav).clone()).numpy()
    our_out = np.asarray(DropFreq(**kw)(None, jnp.asarray(wav),
                                        rng=jax.random.PRNGKey(0)))
    np.testing.assert_allclose(our_out, ref_out, atol=1e-5)


def test_doclip_pinned_matches_reference():
    import_reference_speechbrain()
    from speechbrain.processing.speech_augmentation import DoClip as RefClip

    from svt_speechbrain_tpu.processing.speech_augmentation import DoClip

    rng = np.random.default_rng(1)
    wav = (rng.normal(size=(2, 1000)) * 0.8).astype(np.float32)
    with torch.no_grad():
        ref_out = RefClip(clip_low=0.3, clip_high=0.3, clip_prob=1.0)(
            torch.tensor(wav).clone()).numpy()
    our_out = np.asarray(DoClip(clip_low=0.3, clip_high=0.3, clip_prob=1.0)(
        None, jnp.asarray(wav), rng=jax.random.PRNGKey(0)))
    np.testing.assert_allclose(our_out, ref_out, atol=1e-6)


def test_dropchunk_pinned_matches_reference():
    """DropChunk with pinned length/count/window: identical zeroing; the
    noise_factor fill obeys the same amplitude law (draws differ)."""
    import_reference_speechbrain()
    from speechbrain.processing.speech_augmentation import (DropChunk
                                                            as RefDropChunk)

    from svt_speechbrain_tpu.processing.speech_augmentation import DropChunk

    rng = np.random.default_rng(0)
    wav = (rng.normal(size=(2, 4000)) * 0.5).astype(np.float32)
    lens = np.ones(2, np.float32)
    kw = dict(drop_length_low=300, drop_length_high=300, drop_count_low=1,
              drop_count_high=1, drop_start=500, drop_end=800, drop_prob=1.0)
    with torch.no_grad():
        ref_out = RefDropChunk(**kw)(torch.tensor(wav).clone(),
                                     torch.tensor(lens)).numpy()
    our_out = np.asarray(DropChunk(**kw)(None, jnp.asarray(wav),
                                         jnp.asarray(lens),
                                         rng=jax.random.PRNGKey(0)))
    np.testing.assert_allclose(our_out, ref_out, atol=1e-6)

    kw["noise_factor"] = 0.5
    with torch.no_grad():
        ref_n = RefDropChunk(**kw)(torch.tensor(wav).clone(),
                                   torch.tensor(lens)).numpy()
    our_n = np.asarray(DropChunk(**kw)(None, jnp.asarray(wav),
                                       jnp.asarray(lens),
                                       rng=jax.random.PRNGKey(0)))
    # outside the chunk: identical; inside: same mean-amplitude law
    np.testing.assert_allclose(our_n[:, :500], ref_n[:, :500], atol=1e-6)
    np.testing.assert_allclose(our_n[:, 800:], ref_n[:, 800:], atol=1e-6)
    assert np.isclose(np.abs(our_n[:, 500:800]).mean(),
                      np.abs(ref_n[:, 500:800]).mean(), rtol=0.2)


def test_specaugment_cores_match_reference():
    """SpecAugment's deterministic cores vs the reference lobes: the
    bicubic align_corners=True time warp at pinned (center, width), and
    per-row OR-combined masks with zero and mean fills."""
    import_reference_speechbrain()
    from speechbrain.lobes.augment import SpecAugment as RefSpecAugment

    from svt_speechbrain_tpu.models.augment import SpecAugment

    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 60, 20)).astype(np.float32)

    ref = RefSpecAugment(time_warp=True, freq_mask=False, time_mask=False)
    ours = SpecAugment(time_warp=True)
    for (c, w) in ((25, 28), (30, 26), (10, 14)):
        seq = iter([torch.tensor([c]), torch.tensor([w - 1])])
        orig_randint = torch.randint
        torch.randint = lambda *a, **k: next(seq)
        try:
            with torch.no_grad():
                r = ref.time_warp(torch.tensor(x).clone()).numpy()
        finally:
            torch.randint = orig_randint
        o = np.asarray(ours._time_warp_cw(jnp.asarray(x), c, w))
        np.testing.assert_allclose(o, r, atol=1e-4)

    lens = np.array([[3, 5], [2, 7], [0, 4]])
    poss = np.array([[1, 10], [4, 2], [0, 11]])
    for zero in (True, False):
        ref2 = RefSpecAugment(time_warp=False, freq_mask=True,
                              time_mask=False, freq_mask_width=(0, 8),
                              n_freq_mask=2, replace_with_zero=zero)
        seq = iter([torch.tensor(lens), torch.tensor(poss)])
        orig_randint = torch.randint
        torch.randint = lambda *a, **k: next(seq)
        try:
            with torch.no_grad():
                r = ref2.mask_along_axis(torch.tensor(x).clone(),
                                         dim=2).numpy()
        finally:
            torch.randint = orig_randint
        ours2 = SpecAugment(time_warp=False, replace_with_zero=zero)
        o = np.asarray(ours2._mask(jnp.asarray(x), poss, lens, dim=2))
        np.testing.assert_allclose(o, r, atol=1e-6)
