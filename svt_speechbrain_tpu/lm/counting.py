"""N-gram counting utilities (reference ``speechbrain/lm/counting.py``)."""
from __future__ import annotations

import itertools


def pad_ends(sequence, pad_left=True, left_pad_symbol="<s>",
             right_pad_symbol="</s>"):
    """Pad sentence-boundary symbols around a token sequence
    (reference ``counting.py:24``).

    Example
    -------
    >>> pad_ends(["hello", "world"])
    ['<s>', 'hello', 'world', '</s>']
    """
    sequence = list(sequence)
    if pad_left:
        return [left_pad_symbol] + sequence + [right_pad_symbol]
    return sequence + [right_pad_symbol]


def ngrams(sequence, n):
    """Yield each n-gram (as a tuple) of the sequence
    (reference ``counting.py:58``, itertools window).

    Example
    -------
    >>> list(ngrams(["a", "b", "c", "d"], 2))
    [('a', 'b'), ('b', 'c'), ('c', 'd')]
    """
    iters = itertools.tee(sequence, n)
    for i, it in enumerate(iters):
        for _ in range(i):
            next(it, None)
    return (tuple(win) for win in zip(*iters))


def ngrams_for_evaluation(sequence, max_n, predict_first=False):
    """Yield (token, context) pairs with growing context up to ``max_n - 1``
    (reference ``counting.py:86``): for LM evaluation where the first tokens
    only have short histories."""
    for i in range(not predict_first, len(sequence)):
        context_start = max(0, i - max_n + 1)
        yield sequence[i], sequence[context_start:i]
