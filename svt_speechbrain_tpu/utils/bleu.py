"""BLEU scoring (analogue of reference ``speechbrain/utils/bleu.py``).

The reference wraps sacrebleu; this is a self-contained corpus BLEU with the
standard brevity penalty and up-to-4-gram clipped precision.
"""
from __future__ import annotations

import collections
import math


def _ngrams(tokens, n):
    return collections.Counter(
        tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


def corpus_bleu(hypotheses, references, max_n=4):
    """hypotheses: list of token lists; references: list of lists of token
    lists (multiple references per hypothesis). Returns BLEU in [0, 100].

    Example
    -------
    >>> hyp = [["the", "cat", "sat", "on", "the", "mat"]]
    >>> refs = [[["the", "cat", "sat", "on", "the", "mat"]]]
    >>> round(corpus_bleu(hyp, refs), 1)   # perfect match
    100.0
    >>> corpus_bleu([["dog"]], refs)
    0.0
    """
    clipped = [0] * max_n
    totals = [0] * max_n
    hyp_len = 0
    ref_len = 0
    for hyp, refs in zip(hypotheses, references):
        hyp_len += len(hyp)
        ref_len += min((abs(len(r) - len(hyp)), len(r)) for r in refs)[1]
        for n in range(1, max_n + 1):
            hyp_counts = _ngrams(hyp, n)
            max_ref = collections.Counter()
            for r in refs:
                for gram, c in _ngrams(r, n).items():
                    max_ref[gram] = max(max_ref[gram], c)
            for gram, c in hyp_counts.items():
                clipped[n - 1] += min(c, max_ref.get(gram, 0))
            totals[n - 1] += max(len(hyp) - n + 1, 0)
    # drop orders with no n-grams at all (short corpora); zero clipped counts
    # at a populated order still zero the score
    pairs = [(c, t) for c, t in zip(clipped, totals) if t > 0]
    if not pairs or any(c == 0 for c, _ in pairs):
        return 0.0
    log_precision = sum(math.log(c / t) for c, t in pairs) / len(pairs)
    bp = 1.0 if hyp_len > ref_len else math.exp(1 - ref_len / max(hyp_len, 1))
    return 100.0 * bp * math.exp(log_precision)


class BLEUStats:
    """Accumulate translations and score (reference ``bleu.py`` BLEUStats)."""

    def __init__(self, lang="en", merge_words=True):
        self.merge_words = merge_words
        self.clear()

    def clear(self):
        self.ids = []
        self.predicts = []
        self.targets = None
        self.summary = {}

    def append(self, ids, predict, targets):
        self.ids.extend(ids)
        if self.merge_words:
            predict = [p.split() if isinstance(p, str) else p for p in predict]
            targets = [[t.split() if isinstance(t, str) else t for t in ref]
                       for ref in targets]
        self.predicts.extend(predict)
        if self.targets is None:
            self.targets = [list(ref) for ref in targets]
        else:
            for i, ref in enumerate(targets):
                self.targets[i].extend(ref)

    def summarize(self, field=None):
        # self.targets: list over reference streams; transpose to per-hyp refs
        refs_per_hyp = list(zip(*self.targets)) if self.targets else []
        score = corpus_bleu(self.predicts, refs_per_hyp)
        self.summary = {"BLEU": score, "bleu_score": score}
        if field is not None:
            return self.summary[field]
        return self.summary


def merge_words(sequences):
    """Word lists → space-joined phrases (reference ``bleu.py:4``)."""
    return [" ".join(seq) for seq in sequences]
