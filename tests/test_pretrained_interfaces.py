"""Pretrained inference interfaces (reference ``pretrained/interfaces.py``):
ASR, speaker verification, VAD, separation, enhancement wrappers."""
import functools

import numpy as np

import jax
import jax.numpy as jnp


class _StubModule:
    """Minimal module: init() → {}, call delegates to a lambda."""

    def __init__(self, fn):
        self.fn = fn

    def init(self, rng):
        return {}

    def __call__(self, params, *a, **kw):
        return self.fn(*a, **kw)


class _Tokenizer:
    def decode_ids(self, ids):
        return " ".join(chr(ord("a") + i) for i in ids)


def test_encoder_decoder_asr_wiring():
    from svt_speechbrain_tpu.pretrained import EncoderDecoderASR

    enc = _StubModule(lambda x, lengths=None: jnp.asarray(x)[..., None] * 2.0)

    def searcher(enc_states, enc_lens):
        return [[0, 1, 2]], jnp.zeros((1,))

    asr = EncoderDecoderASR(
        modules={"encoder": enc, "decoder": searcher},
        hparams={"tokenizer": _Tokenizer()})
    asr.init_params()
    words, hyps = asr.transcribe_batch(np.zeros((1, 100), np.float32))
    assert words == ["a b c"]
    assert list(hyps[0]) == [0, 1, 2]


def test_encoder_asr_ctc_decoding():
    from svt_speechbrain_tpu.decoders.ctc import ctc_greedy_decode
    from svt_speechbrain_tpu.pretrained import EncoderASR

    # encoder emits fixed per-frame log-probs: tokens [1, 1, blank, 2] → "b c"
    post = np.full((1, 4, 4), -10.0, np.float32)
    for t, tok in enumerate([1, 1, 3, 2]):
        post[0, t, tok] = 0.0
    enc = _StubModule(lambda x, lengths=None: jnp.asarray(post))
    asr = EncoderASR(
        modules={"encoder": enc},
        hparams={"tokenizer": _Tokenizer(),
                 "decoding_function": functools.partial(ctc_greedy_decode,
                                                        blank_id=3)})
    asr.init_params()
    words, hyps = asr.transcribe_batch(np.zeros((1, 100), np.float32))
    assert list(hyps[0]) == [1, 2]
    assert words == ["b c"]


def test_speaker_recognition_verify():
    from svt_speechbrain_tpu.models.features import Fbank
    from svt_speechbrain_tpu.models.xvector import Xvector
    from svt_speechbrain_tpu.pretrained import SpeakerRecognition

    class _FbankMod(_StubModule):
        def __init__(self):
            fb = Fbank(n_mels=24)
            super().__init__(lambda x: fb({}, jnp.asarray(x)))

    xv = Xvector(in_channels=24, tdnn_channels=(32, 32, 32, 32, 64),
                 lin_neurons=16)

    class _Emb:
        def init(self, rng):
            return xv.init(rng)

        def __call__(self, params, feats, lengths=None):
            return xv(params, feats)

    sr = SpeakerRecognition(
        modules={"compute_features": _FbankMod(), "embedding_model": _Emb()},
        hparams={})
    sr.init_params(seed=0)
    rng = np.random.default_rng(0)
    a = np.sin(2 * np.pi * 220 * np.arange(16000) / 16000).astype(np.float32)
    b = rng.normal(size=16000).astype(np.float32)
    score_same, same = sr.verify_batch(a[None], a[None])
    score_diff, _ = sr.verify_batch(a[None], b[None])
    assert score_same[0] > 0.999 and bool(same[0])
    assert score_diff[0] < score_same[0]


def test_vad_segments():
    from svt_speechbrain_tpu.pretrained import VAD

    res = 0.01  # 10 ms frames
    sr_hz = 16000
    chunk = int(sr_hz * res)

    class _Energy(_StubModule):
        def __init__(self):
            super().__init__(None)

        def __call__(self, params, feats):
            return feats  # already logits

    def feats_fn(wavs):
        w = jnp.asarray(wavs)
        n = w.shape[1] // chunk
        fr = w[:, :n * chunk].reshape(w.shape[0], n, chunk)
        e = jnp.mean(jnp.square(fr), axis=-1, keepdims=True)
        return jnp.where(e > 0.01, 8.0, -8.0)  # logits

    vad = VAD(modules={"compute_features": _StubModule(feats_fn),
                       "mean_var_norm": _StubModule(lambda x, lens=None: x),
                       "model": _Energy()},
              hparams={"sample_rate": sr_hz, "time_resolution": res})
    vad.init_params()

    # 0.5 s speech, 0.5 s silence, 0.5 s speech
    rng = np.random.default_rng(0)
    seg = rng.normal(size=8000).astype(np.float32)
    wav = np.concatenate([seg, np.zeros(8000, np.float32), seg])[None]
    bounds = vad.get_speech_segments(wav, double_check=True)
    assert bounds.shape == (2, 2)
    np.testing.assert_allclose(bounds[0], [0.0, 0.5], atol=0.05)
    np.testing.assert_allclose(bounds[1], [1.0, 1.5], atol=0.05)

    # hysteresis: 0.3 stays active once on (deact 0.25), but can't activate
    p = np.array([[[0.3], [0.6], [0.3], [0.2], [0.3]]])
    th = vad.apply_threshold(p, activation_th=0.5, deactivation_th=0.25)
    assert th[0, :, 0].tolist() == [0.0, 1.0, 1.0, 0.0, 0.0]

    merged = vad.merge_close_segments(np.array([[0.0, 1.0], [1.1, 2.0],
                                                [3.0, 4.0]]), close_th=0.25)
    assert merged.shape == (2, 2) and merged[0].tolist() == [0.0, 2.0]
    kept = vad.remove_short_segments(np.array([[0.0, 0.1], [1.0, 2.0]]),
                                     len_th=0.25)
    assert kept.tolist() == [[1.0, 2.0]]


def test_sepformer_separation_shapes():
    from svt_speechbrain_tpu.models.separation import (MaskNet, TasNetDecoder,
                                                       TasNetEncoder)
    from svt_speechbrain_tpu.pretrained import SepformerSeparation

    sep = SepformerSeparation(
        modules={"encoder": TasNetEncoder(16, 32),
                 "masknet": MaskNet(32, 16, 32, 3, n_blocks=2, n_repeats=1,
                                    n_sources=2),
                 "decoder": TasNetDecoder(16, 32)},
        hparams={})
    sep.init_params(seed=0)
    mix = np.random.default_rng(0).normal(size=(1, 1600)).astype(np.float32)
    est = sep.separate_batch(mix)
    assert est.shape == (1, 1600, 2)
    assert np.isfinite(np.asarray(est)).all()


def test_spectral_mask_enhancement_identity_mask():
    from svt_speechbrain_tpu.pretrained import SpectralMaskEnhancement
    from svt_speechbrain_tpu.processing.features import (ISTFT, STFT,
                                                         spectral_magnitude)
    from svt_speechbrain_tpu.processing.signal_processing import resynthesize

    stft = STFT(16000)
    istft = ISTFT(16000)
    enhancer = SpectralMaskEnhancement(
        modules={"enhance_model": _StubModule(
            lambda feats, lengths=None: jnp.ones_like(feats))},
        hparams={"compute_stft": stft,
                 "spectral_magnitude": functools.partial(spectral_magnitude,
                                                         power=0.5),
                 "resynth": functools.partial(resynthesize, stft=stft,
                                              istft=istft)})
    enhancer.init_params()
    rng = np.random.default_rng(0)
    noisy = rng.normal(size=(1, 8000)).astype(np.float32)
    out = np.asarray(enhancer.enhance_batch(noisy))
    assert out.shape == noisy.shape
    # identity mask ⇒ output is the peak-normalized input
    ref = noisy[0] / np.abs(noisy[0]).max()
    c = np.corrcoef(out[0, 200:7800], ref[200:7800])[0, 1]
    assert c > 0.999


def test_mod_default_collate():
    from svt_speechbrain_tpu.utils.data_utils import mod_default_collate

    assert mod_default_collate([np.zeros(3), np.ones(3)]).shape == (2, 3)
    ragged = mod_default_collate([np.zeros(3), np.ones(4)])
    assert isinstance(ragged, list) and len(ragged) == 2
    assert mod_default_collate([1, 2]).tolist() == [1, 2]
    assert mod_default_collate([1.5, 2.5]).dtype == np.float64
    assert mod_default_collate(["a", "b"]) == ["a", "b"]
