"""Accuracy computation (analogue of reference ``speechbrain/utils/Accuracy.py``)."""
from __future__ import annotations

import numpy as np

from svt_speechbrain_tpu.nnet.losses import length_to_mask


class AccuracyStats:
    """Accumulate masked token accuracy (reference ``Accuracy.py:42``).

    Example
    -------
    >>> import numpy as np
    >>> stats = AccuracyStats()
    >>> logp = np.log([[[0.9, 0.1], [0.2, 0.8], [0.6, 0.4]]])
    >>> stats.append(logp, np.asarray([[0, 1, 1]]),
    ...              length=np.asarray([2 / 3]))     # last frame is padding
    >>> stats.summarize()
    1.0
    """

    def __init__(self):
        self.correct = 0.0
        self.total = 0.0

    def append(self, log_probabilities, targets, length=None):
        numerator, denominator = Accuracy(log_probabilities, targets, length)
        self.correct += numerator
        self.total += denominator

    def summarize(self):
        return self.correct / max(self.total, 1.0)


def Accuracy(log_probabilities, targets, length=None):
    """(num correct, num total) over non-padding positions
    (reference ``Accuracy.py:7``)."""
    log_probabilities = np.asarray(log_probabilities)
    targets = np.asarray(targets)
    if length is not None:
        mask = np.asarray(length_to_mask(
            np.asarray(length) * targets.shape[1], max_len=targets.shape[1]))
    else:
        mask = np.ones_like(targets, dtype=np.float64)
    padded_pred = log_probabilities.argmax(-1)
    numerator = float(((padded_pred == targets) * mask).sum())
    denominator = float(mask.sum())
    return numerator, denominator
