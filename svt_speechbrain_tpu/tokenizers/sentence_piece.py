"""Tokenizers (analogue of reference
``speechbrain/tokenizers/SentencePiece.py``).

The reference trains/loads a SentencePiece BPE/unigram model from manifest
text. The ``sentencepiece`` package is not in the TPU image, so the wrapper
is import-gated; ``CharTokenizer``/``WordTokenizer`` provide self-contained
fallbacks with the same encode/decode surface.
"""
from __future__ import annotations

import csv
import json
import logging
import os

logger = logging.getLogger(__name__)


class SentencePiece:
    """BPE/unigram tokenizer via the sentencepiece library
    (reference ``SentencePiece.py:20``); trains from a CSV/JSON manifest
    column on first use."""

    def __init__(self, model_dir, vocab_size, annotation_train=None,
                 annotation_read=None, model_type="unigram", char_format_input=False,
                 character_coverage=1.0, annotation_format="csv", **kwargs):
        try:
            import sentencepiece as spm
        except ImportError as e:
            raise ImportError(
                "sentencepiece is not available in this environment; use "
                "CharTokenizer/WordTokenizer or install sentencepiece") from e
        self.spm = spm
        os.makedirs(model_dir, exist_ok=True)
        self.prefix_model_file = os.path.join(
            model_dir, f"{vocab_size}_{model_type}")
        if not os.path.isfile(self.prefix_model_file + ".model"):
            assert annotation_train is not None
            text_file = self.prefix_model_file + ".txt"
            self._csv2text(annotation_train, annotation_read, text_file,
                           annotation_format, char_format_input)
            spm.SentencePieceTrainer.train(
                input=text_file, model_prefix=self.prefix_model_file,
                vocab_size=vocab_size, model_type=model_type,
                character_coverage=character_coverage)
        self.sp = spm.SentencePieceProcessor()
        self.sp.load(self.prefix_model_file + ".model")

    @staticmethod
    def _csv2text(annotation_train, annotation_read, text_file,
                  annotation_format, char_format_input):
        with open(text_file, "w") as out:
            if annotation_format == "json":
                with open(annotation_train) as f:
                    data = json.load(f)
                rows = (entry[annotation_read] for entry in data.values())
            else:
                with open(annotation_train, newline="") as f:
                    rows = [row[annotation_read] for row in csv.DictReader(f)]
            for text in rows:
                if char_format_input:
                    text = " ".join("".join(text.split()))
                out.write(text + "\n")

    def __call__(self, batch, batch_lens=None, ind2lab=None, task="encode"):
        if task == "encode":
            return [self.sp.encode_as_ids(t) for t in batch]
        if task == "decode":
            return [self.sp.decode_ids(list(map(int, seq))) for seq in batch]
        raise ValueError(task)


class CharTokenizer:
    """Character-level tokenizer with the SentencePiece call surface.

    Example
    -------
    >>> tok = CharTokenizer(vocab=["abc", "cab"])
    >>> ids = tok.encode("cab")
    >>> ids, tok.decode(ids), tok.vocab_size   # id 0 reserved for unk
    ([3, 1, 2], 'cab', 4)
    """

    def __init__(self, vocab=None, unk_id=0):
        self.unk_id = unk_id
        self.char2id = {}
        self.id2char = {}
        if vocab:
            self.fit(vocab)

    def fit(self, texts):
        chars = sorted({c for t in texts for c in t})
        self.char2id = {c: i + 1 for i, c in enumerate(chars)}
        self.id2char = {i: c for c, i in self.char2id.items()}
        return self

    @property
    def vocab_size(self):
        return len(self.char2id) + 1

    def encode(self, text):
        return [self.char2id.get(c, self.unk_id) for c in text]

    def decode(self, ids):
        return "".join(self.id2char.get(int(i), "") for i in ids)

    def __call__(self, batch, task="encode"):
        if task == "encode":
            return [self.encode(t) for t in batch]
        return [self.decode(seq) for seq in batch]


class WordTokenizer:
    """Whitespace word tokenizer with a fitted vocabulary."""

    def __init__(self, unk_id=0):
        self.unk_id = unk_id
        self.word2id = {}
        self.id2word = {}

    def fit(self, texts):
        words = sorted({w for t in texts for w in t.split()})
        self.word2id = {w: i + 1 for i, w in enumerate(words)}
        self.id2word = {i: w for w, i in self.word2id.items()}
        return self

    def encode(self, text):
        return [self.word2id.get(w, self.unk_id) for w in text.split()]

    def decode(self, ids):
        return " ".join(self.id2word.get(int(i), "<unk>") for i in ids)
