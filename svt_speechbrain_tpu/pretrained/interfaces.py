"""Pretrained inference interfaces (analogue of reference
``speechbrain/pretrained/interfaces.py``).

``Pretrained.from_hparams`` loads an inference yaml + pretrainer and returns
a ready-to-call object; ``SingingTranscriber`` is the AMT flagship interface
wrapping the batched chunked pipeline.
"""
from __future__ import annotations

import logging
import os

import numpy as np

import jax

logger = logging.getLogger(__name__)


class Pretrained:
    """Base inference interface (reference ``interfaces.py:107``).

    Subclasses declare ``HPARAMS_NEEDED``/``MODULES_NEEDED``; the loaded
    hparams dict is exposed like in the Brain.

    Example
    -------
    >>> from svt_speechbrain_tpu.nnet.linear import Linear
    >>> pt = Pretrained(modules={"head": Linear(4, 8)}, hparams={"foo": 1})
    >>> params = pt.init_params()
    >>> sorted(params), params["head"]["w"].shape, pt.hparams.foo
    (['head'], (8, 4), 1)
    """

    HPARAMS_NEEDED = []
    MODULES_NEEDED = []

    def __init__(self, modules=None, hparams=None):
        from types import SimpleNamespace

        self.mods = SimpleNamespace(**(modules or {}))
        self.hparams = SimpleNamespace(**(hparams or {}))
        for name in self.HPARAMS_NEEDED:
            if not hasattr(self.hparams, name):
                raise ValueError(f"Need hparams['{name}']")
        for name in self.MODULES_NEEDED:
            if not hasattr(self.mods, name):
                raise ValueError(f"Need modules['{name}']")
        # engine-owned params, installed by load_params / pretrainer
        self.params = {}
        self.states = {}

    def init_params(self, seed=1234):
        rng = jax.random.PRNGKey(seed)
        for name, module in vars(self.mods).items():
            if not hasattr(module, "init"):  # e.g. beam searchers own their params
                continue
            rng, sub = jax.random.split(rng)
            self.params[name] = module.init(sub)
            if hasattr(module, "init_state"):
                self.states[name] = module.init_state()
        return self.params

    @classmethod
    def from_hparams(cls, source, hparams_file="hyperparams.yaml", savedir=None,
                     overrides=None, **kwargs):
        """Load an inference config + pretrained parameters
        (reference ``interfaces.py:267``)."""
        from svt_speechbrain_tpu.config import load_hyperyaml
        from svt_speechbrain_tpu.pretrained.fetching import fetch

        savedir = savedir or f"./pretrained_models/{str(source).replace('/', '--')}"
        path = fetch(hparams_file, source, savedir)
        with open(path) as f:
            hparams = load_hyperyaml(f, overrides)
        instance = cls(modules=hparams.get("modules", {}), hparams=hparams, **kwargs)
        instance.init_params()
        pretrainer = hparams.get("pretrainer")
        if pretrainer is not None:
            pretrainer.collect_files(default_source=source)
            pretrainer.load_collected()
        return instance


class SingingTranscriber(Pretrained):
    """Whole-song AMT inference (the flagship deployment path): waveforms →
    note events, batched and chunked on TPU.

    Needs modules ``wav2vec2`` + ``model`` and the AMT decode hparams."""

    HPARAMS_NEEDED = ["frame_rate", "onset_threshold", "offset_threshold"]
    MODULES_NEEDED = ["wav2vec2", "model"]

    def __init__(self, *args, batch_size=32, chunk_seconds=5.0,
                 chunking="ceil", quantize=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.batch_size = batch_size
        self.chunk_seconds = chunk_seconds
        # "ceil" (throughput) | "reference" (bit-equal to the recipes'
        # batch-1 eval) | "song" (whole-song attention windows via the
        # flash kernel — use a small batch_size)
        self.chunking = chunking
        # quantize="int8": a8w8 encoder projections/FFNs on the MXU's int8
        # path (~1.5× those matmuls on v5e; see models/quantize.py). The
        # default bf16 path is the reference-parity surface.
        if quantize not in (None, "int8"):
            raise ValueError(f"Unknown quantize mode: {quantize!r}")
        self.quantize = quantize
        self._transcriber = None

    def _serving_params(self):
        """Fresh (full-precision, possibly int8-quantized) param tree for a
        new transcriber/server. Built from ``self.params`` every call so a
        downstream ``compute_dtype`` choice acts on untruncated weights —
        never on a tree a previous transcriber already cast to bf16."""
        w2v_params = self.params["wav2vec2"]
        if self.quantize == "int8":
            if getattr(self, "_int8_w2v", None) is None:
                from svt_speechbrain_tpu.models.quantize import (
                    quantize_wav2vec2)

                # one shared int8 tree for every session/server — derived
                # from the full-precision params (NOT a bf16-cast copy),
                # so the compute_dtype guarantee above still holds
                self._int8_w2v = quantize_wav2vec2(w2v_params)
            w2v_params = self._int8_w2v
        return {"wav2vec2": w2v_params, "model": self.params["model"]}

    def _get_transcriber(self):
        if self._transcriber is None:
            from svt_speechbrain_tpu.inference import BatchedAMTTranscriber

            self._transcriber = BatchedAMTTranscriber(
                self.mods.wav2vec2, self.mods.model, self._serving_params(),
                chunk_seconds=self.chunk_seconds, batch_size=self.batch_size,
                frame_rate=self.hparams.frame_rate,
                onset_threshold=self.hparams.onset_threshold,
                offset_threshold=self.hparams.offset_threshold,
                chunking=self.chunking)
        return self._transcriber

    def transcribe_file(self, path):
        """Audio file → [[onset_s, offset_s, midi], ...]."""
        from svt_speechbrain_tpu.dataio.dataio import read_audio

        wav = read_audio(path)
        return self.transcribe_batch({os.path.basename(path): wav})[os.path.basename(path)]

    def transcribe_batch(self, songs):
        """dict name → waveform ⇒ dict name → note events."""
        return self._get_transcriber().transcribe(songs)

    def stream(self, **kwargs):
        """Open a low-latency streaming session sharing this interface's
        model and ``quantize`` mode: ``feed()`` PCM as it arrives,
        ``flush()`` at stream end (see
        :class:`~svt_speechbrain_tpu.inference.StreamingAMTTranscriber`;
        a capability beyond the reference's offline-only eval,
        ``MIR_ST500/train_audio_ssl.py:84-141``). Each call returns an
        independent session; extra kwargs (``compact``, ``compute_dtype``,
        ...) pass through — ``compute_dtype`` acts on the full-precision
        weights, not a previously bf16-cast tree."""
        from svt_speechbrain_tpu.inference import StreamingAMTTranscriber

        return StreamingAMTTranscriber(
            self.mods.wav2vec2, self.mods.model, self._serving_params(),
            chunk_seconds=self.chunk_seconds,
            frame_rate=self.hparams.frame_rate,
            onset_threshold=self.hparams.onset_threshold,
            offset_threshold=self.hparams.offset_threshold, **kwargs)

    def serve(self, batch_size=8, **kwargs):
        """Open a multiplexed streaming server sharing this interface's
        model and ``quantize`` mode: N concurrent ``server.open()`` sessions
        batch their ready windows into ONE device program (see
        :class:`~svt_speechbrain_tpu.inference.StreamingServer`; the
        reference's eval is offline batch-1,
        ``MIR_ST500/train_audio_ssl.py:84-141``)."""
        from svt_speechbrain_tpu.inference import StreamingServer

        return StreamingServer(
            self.mods.wav2vec2, self.mods.model, self._serving_params(),
            batch_size=batch_size, chunk_seconds=self.chunk_seconds,
            frame_rate=self.hparams.frame_rate,
            onset_threshold=self.hparams.onset_threshold,
            offset_threshold=self.hparams.offset_threshold, **kwargs)


class EncoderClassifier(Pretrained):
    """Generic encoder + classifier inference (reference ``interfaces.py:719``)."""

    MODULES_NEEDED = ["compute_features", "embedding_model", "classifier"]

    def encode_batch(self, wavs, wav_lens=None):
        feats = self.mods.compute_features(
            self.params.get("compute_features", {}), wavs)
        return self.mods.embedding_model(
            self.params["embedding_model"], feats, lengths=wav_lens)

    def classify_batch(self, wavs, wav_lens=None):
        emb = self.encode_batch(wavs, wav_lens)
        out = self.mods.classifier(self.params["classifier"], emb)
        score = np.asarray(out).max(-1)
        index = np.asarray(out).argmax(-1)
        return out, score, index


class EncoderDecoderASR(Pretrained):
    """Encoder + autoregressive-decoder ASR inference (reference
    ``interfaces.py:481``): encoder module (feature pipeline + model) and a
    beam/greedy searcher as ``decoder``; token ids are detokenized with
    ``hparams['tokenizer']``."""

    HPARAMS_NEEDED = ["tokenizer"]
    MODULES_NEEDED = ["encoder", "decoder"]

    def encode_batch(self, wavs, wav_lens=None):
        import jax.numpy as jnp

        if wav_lens is None:
            wav_lens = jnp.ones((jnp.asarray(wavs).shape[0],))
        return self.mods.encoder(self.params.get("encoder", {}), wavs,
                                 lengths=wav_lens)

    def transcribe_batch(self, wavs, wav_lens=None):
        """Waveforms → (list of word strings, token id hyps)."""
        import jax.numpy as jnp

        if wav_lens is None:
            wav_lens = jnp.ones((jnp.asarray(wavs).shape[0],))
        enc = self.encode_batch(wavs, wav_lens)
        hyps, _scores = self.mods.decoder(enc, wav_lens)
        tok = self.hparams.tokenizer
        words = [tok.decode_ids(list(map(int, h))) if hasattr(tok, "decode_ids")
                 else tok.decode(list(map(int, h))) for h in hyps]
        return words, hyps

    def transcribe_file(self, path):
        from svt_speechbrain_tpu.dataio.dataio import read_audio

        wav = np.asarray(read_audio(path))[None]
        words, _ = self.transcribe_batch(wav)
        return words[0]


class EncoderASR(Pretrained):
    """Encoder-only (CTC) ASR inference (reference ``interfaces.py:619``):
    ``hparams['decoding_function']`` maps encoder posteriors + lengths to
    token sequences (e.g. ``decoders.ctc_greedy_decode``)."""

    HPARAMS_NEEDED = ["tokenizer", "decoding_function"]
    MODULES_NEEDED = ["encoder"]

    def encode_batch(self, wavs, wav_lens=None):
        import jax.numpy as jnp

        if wav_lens is None:
            wav_lens = jnp.ones((jnp.asarray(wavs).shape[0],))
        return self.mods.encoder(self.params.get("encoder", {}), wavs,
                                 lengths=wav_lens)

    def transcribe_batch(self, wavs, wav_lens=None):
        import jax.numpy as jnp

        if wav_lens is None:
            wav_lens = jnp.ones((jnp.asarray(wavs).shape[0],))
        enc = self.encode_batch(wavs, wav_lens)
        hyps = self.hparams.decoding_function(enc, wav_lens)
        tok = self.hparams.tokenizer
        words = [tok.decode_ids(list(map(int, h))) if hasattr(tok, "decode_ids")
                 else tok.decode(list(map(int, h))) for h in hyps]
        return words, hyps


class SpeakerRecognition(EncoderClassifier):
    """Speaker verification by embedding cosine similarity (reference
    ``interfaces.py:881``)."""

    MODULES_NEEDED = ["compute_features", "embedding_model"]

    def verify_batch(self, wavs1, wavs2, wav_lens1=None, wav_lens2=None,
                     threshold=0.25):
        """Returns (cosine scores, boolean same-speaker decisions)."""
        emb1 = np.asarray(self.encode_batch(wavs1, wav_lens1)).reshape(
            len(wavs1), -1)
        emb2 = np.asarray(self.encode_batch(wavs2, wav_lens2)).reshape(
            len(wavs2), -1)
        num = np.sum(emb1 * emb2, axis=-1)
        den = (np.linalg.norm(emb1, axis=-1) * np.linalg.norm(emb2, axis=-1)
               + 1e-12)
        score = num / den
        return score, score > threshold

    def verify_files(self, path_x, path_y, threshold=0.25):
        from svt_speechbrain_tpu.dataio.dataio import read_audio

        x = np.asarray(read_audio(path_x))[None]
        y = np.asarray(read_audio(path_y))[None]
        score, decision = self.verify_batch(x, y, threshold=threshold)
        return float(score[0]), bool(decision[0])


class VAD(Pretrained):
    """Voice activity detection (reference ``interfaces.py:980``): a frame
    classifier over features produces speech posteriors; host-side numpy
    post-processing turns them into boundaries. The reference's
    large-file streaming orchestration is replaced by whole-array calls —
    chunking long audio is the caller's (or ``get_speech_segments``'s) job."""

    HPARAMS_NEEDED = ["sample_rate", "time_resolution"]
    MODULES_NEEDED = ["compute_features", "mean_var_norm", "model"]

    def get_speech_prob_chunk(self, wavs, wav_lens=None):
        """(B, T) waveforms → (B, frames, 1) speech posteriors."""
        import jax
        import jax.numpy as jnp

        wavs = jnp.asarray(wavs)
        if wav_lens is None:
            wav_lens = jnp.ones((wavs.shape[0],))
        feats = self.mods.compute_features(
            self.params.get("compute_features", {}), wavs)
        norm = self.mods.mean_var_norm
        if hasattr(norm, "init_state"):   # stateful: (params, state, x, lens)
            if self.states.get("mean_var_norm") is None:
                self.states["mean_var_norm"] = norm.init_state()
            feats, self.states["mean_var_norm"] = norm(
                self.params.get("mean_var_norm", {}),
                self.states["mean_var_norm"], feats, wav_lens)
        else:
            feats = norm(self.params.get("mean_var_norm", {}), feats, wav_lens)
        out = self.mods.model(self.params["model"], feats)
        if isinstance(out, tuple):
            out = out[0]
        return jax.nn.sigmoid(out)

    def apply_threshold(self, vad_prob, activation_th=0.5, deactivation_th=0.25):
        """Double-threshold hysteresis (reference ``interfaces.py:1218``):
        switch on above ``activation_th``, off below ``deactivation_th``."""
        p = np.asarray(vad_prob)
        out = np.zeros_like(p)
        for b in range(p.shape[0]):
            active = False
            for t in range(p.shape[1]):
                v = p[b, t, 0] if p.ndim == 3 else p[b, t]
                if active:
                    active = v > deactivation_th
                else:
                    active = v > activation_th
                if p.ndim == 3:
                    out[b, t, 0] = float(active)
                else:
                    out[b, t] = float(active)
        return out

    def get_boundaries(self, prob_th, output_value="seconds"):
        """Binary frame decisions → (N, 2) [start, end] boundaries in seconds
        (or frames) per the hparams ``time_resolution``
        (reference ``interfaces.py:1257``)."""
        p = np.asarray(prob_th)
        if p.ndim == 3:
            p = p[0, :, 0]
        elif p.ndim == 2:
            p = p[0]
        padded = np.concatenate([[0.0], p, [0.0]])
        diff = np.diff(padded)
        starts = np.nonzero(diff == 1)[0]
        ends = np.nonzero(diff == -1)[0]
        bounds = np.stack([starts, ends], axis=-1).astype(np.float64)
        if output_value == "seconds":
            bounds = bounds * float(self.hparams.time_resolution)
        return bounds

    def energy_VAD(self, wavs, activation_th=0.5, deactivation_th=0.0,
                   eps=1e-6):
        """Energy-based posterior in [0, 1]: per-chunk energies min-max
        normalized then double-thresholded (reference ``interfaces.py:1466``,
        used to refine neural boundaries within speech segments)."""
        wavs = np.asarray(wavs)
        chunk = int(self.hparams.sample_rate * self.hparams.time_resolution)
        n = wavs.shape[1] // chunk
        frames = wavs[:, :n * chunk].reshape(wavs.shape[0], n, chunk)
        energy = np.log(np.mean(frames.astype(np.float64) ** 2, axis=-1) + eps)
        emin, emax = energy.min(-1, keepdims=True), energy.max(-1, keepdims=True)
        norm = (energy - emin) / np.maximum(emax - emin, eps)
        return self.apply_threshold(norm[..., None], activation_th,
                                    deactivation_th)

    def merge_close_segments(self, boundaries, close_th=0.25):
        """Merge segments separated by less than ``close_th`` seconds."""
        if len(boundaries) == 0:
            return boundaries
        merged = [list(boundaries[0])]
        for seg in boundaries[1:]:
            if seg[0] - merged[-1][1] < close_th:
                merged[-1][1] = seg[1]
            else:
                merged.append(list(seg))
        return np.asarray(merged)

    def remove_short_segments(self, boundaries, len_th=0.25):
        """Drop segments shorter than ``len_th`` seconds."""
        boundaries = np.asarray(boundaries)
        if len(boundaries) == 0:
            return boundaries
        return boundaries[(boundaries[:, 1] - boundaries[:, 0]) >= len_th]

    def double_check_speech_segments(self, boundaries, wavs,
                                     speech_th=0.5):
        """Re-score each candidate segment with the neural model and keep
        those whose mean posterior exceeds ``speech_th``
        (reference ``interfaces.py:1677``)."""
        sr = self.hparams.sample_rate
        wavs = np.asarray(wavs)
        keep = []
        for seg in np.asarray(boundaries):
            lo, hi = int(seg[0] * sr), int(seg[1] * sr)
            if hi - lo < int(sr * self.hparams.time_resolution):
                continue
            prob = self.get_speech_prob_chunk(wavs[:, lo:hi])
            if float(np.asarray(prob).mean()) > speech_th:
                keep.append(seg)
        return np.asarray(keep) if keep else np.zeros((0, 2))

    def get_speech_segments(self, wavs, activation_th=0.5,
                            deactivation_th=0.25, close_th=0.25, len_th=0.25,
                            double_check=True, speech_th=0.5):
        """End-to-end convenience: posteriors → hysteresis → boundaries →
        merge/min-length → optional double check."""
        prob = self.get_speech_prob_chunk(wavs)
        prob_th = self.apply_threshold(prob, activation_th, deactivation_th)
        bounds = self.get_boundaries(prob_th)
        bounds = self.merge_close_segments(bounds, close_th)
        bounds = self.remove_short_segments(bounds, len_th)
        if double_check and len(bounds):
            bounds = self.double_check_speech_segments(bounds, wavs, speech_th)
        return bounds


class SepformerSeparation(Pretrained):
    """Source separation inference (reference ``interfaces.py:1907``):
    encoder → mask network → per-source masked decode, output trimmed/padded
    to the mixture length. Works with any of our separators exposing the
    encoder/masknet/decoder split (Conv-TasNet, SepFormer)."""

    MODULES_NEEDED = ["encoder", "masknet", "decoder"]

    def separate_batch(self, mix):
        import jax.numpy as jnp

        mix = jnp.asarray(mix)
        h = self.mods.encoder(self.params["encoder"], mix)      # (B, T', C)
        masks = self.mods.masknet(self.params["masknet"], h)    # (B, T', S, C)
        n_src = masks.shape[2]
        srcs = [self.mods.decoder(self.params["decoder"], h * masks[:, :, s])
                for s in range(n_src)]
        est = jnp.stack(srcs, axis=-1)                          # (B, T'', S)
        t_mix, t_est = mix.shape[1], est.shape[1]
        if t_est > t_mix:
            est = est[:, :t_mix]
        elif t_est < t_mix:
            est = jnp.pad(est, ((0, 0), (0, t_mix - t_est), (0, 0)))
        return est

    def separate_file(self, path):
        from svt_speechbrain_tpu.dataio.dataio import read_audio

        mix = np.asarray(read_audio(path))[None]
        return self.separate_batch(mix)


class SpectralMaskEnhancement(Pretrained):
    """Spectral-mask speech enhancement inference (reference
    ``interfaces.py:2009``): log1p-magnitude features → mask model →
    masked features → resynthesis with the noisy phase."""

    HPARAMS_NEEDED = ["compute_stft", "spectral_magnitude", "resynth"]
    MODULES_NEEDED = ["enhance_model"]

    def compute_features(self, wavs):
        import jax.numpy as jnp

        stft = self.hparams.compute_stft(None, wavs)
        mag = self.hparams.spectral_magnitude(stft)
        return jnp.log1p(mag)

    def enhance_batch(self, noisy, lengths=None):
        import jax.numpy as jnp

        noisy = jnp.asarray(noisy)
        feats = self.compute_features(noisy)
        out = self.mods.enhance_model(self.params["enhance_model"], feats,
                                      lengths=lengths)
        mask = out[0] if isinstance(out, tuple) else out
        enhanced = mask * feats
        return self.hparams.resynth(jnp.expm1(enhanced), noisy)

    def enhance_file(self, path, output_path=None):
        from svt_speechbrain_tpu.dataio.dataio import read_audio, write_audio

        noisy = np.asarray(read_audio(path))[None]
        enhanced = self.enhance_batch(noisy)
        if output_path is not None:
            write_audio(output_path, np.asarray(enhanced)[0],
                        self.hparams.__dict__.get("sample_rate", 16000))
        return enhanced
