"""Accuracy computation — REFERENCE-EXACT
(``speechbrain/utils/Accuracy.py``), golden-tested in
``tests/test_metrics_golden.py``."""
from __future__ import annotations

import numpy as np

from svt_speechbrain_tpu.nnet.losses import length_to_mask


class AccuracyStats:
    """Accumulate masked token accuracy (reference ``Accuracy.py:50``).

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
        return self.correct / self.total


def Accuracy(log_probabilities, targets, length=None):
    """(num correct, num total) as floats (reference ``Accuracy.py:10``):
    masked positions are dropped when ``length`` is given (the (B, T) mask
    is repeated across the feature axis for 3-D targets); without
    ``length`` the denominator is ``batch * time`` even for 3-D targets —
    a reference quirk, mirrored."""
    log_probabilities = np.asarray(log_probabilities)
    targets = np.asarray(targets)
    padded_pred = log_probabilities.argmax(-1)
    if length is not None:
        mask = np.asarray(length_to_mask(
            np.asarray(length) * targets.shape[1],
            max_len=targets.shape[1])) > 0
        if targets.ndim == 3:
            mask = np.repeat(mask[:, :, None], targets.shape[2], axis=2)
        numerator = float((padded_pred[mask] == targets[mask]).sum())
        denominator = float(mask.sum())
    else:
        numerator = float((padded_pred == targets).sum())
        denominator = float(targets.shape[0] * targets.shape[1])
    return numerator, denominator
