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

    def __init__(self, *args, batch_size=32, chunk_seconds=5.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.batch_size = batch_size
        self.chunk_seconds = chunk_seconds
        self._transcriber = None

    def _get_transcriber(self):
        if self._transcriber is None:
            from svt_speechbrain_tpu.inference import BatchedAMTTranscriber

            self._transcriber = BatchedAMTTranscriber(
                self.mods.wav2vec2, self.mods.model,
                {"wav2vec2": self.params["wav2vec2"], "model": self.params["model"]},
                chunk_seconds=self.chunk_seconds, batch_size=self.batch_size,
                frame_rate=self.hparams.frame_rate,
                onset_threshold=self.hparams.onset_threshold,
                offset_threshold=self.hparams.offset_threshold)
        return self._transcriber

    def transcribe_file(self, path):
        """Audio file → [[onset_s, offset_s, midi], ...]."""
        from svt_speechbrain_tpu.dataio.dataio import read_audio

        wav = read_audio(path)
        return self.transcribe_batch({os.path.basename(path): wav})[os.path.basename(path)]

    def transcribe_batch(self, songs):
        """dict name → waveform ⇒ dict name → note events."""
        return self._get_transcriber().transcribe(songs)


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
