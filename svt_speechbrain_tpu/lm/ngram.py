"""Back-off n-gram LM (analogue of reference ``speechbrain/lm/ngram.py``)."""
from __future__ import annotations

import collections

NEGINFINITY = float("-inf")


class BackoffNgramLM:
    """Query interface over ARPA-style ngrams/backoffs
    (reference ``ngram.py:12``): ``logprob(token, context)`` applies the
    standard Katz back-off recursion.

    Example
    -------
    >>> ngrams = {1: {(): {"a": -0.5, "b": -1.0}},
    ...           2: {("a",): {"b": -0.2}}}
    >>> backoffs = {1: {("a",): -0.3}}
    >>> lm = BackoffNgramLM(ngrams, backoffs)
    >>> lm.logprob("b", context=("a",))      # bigram hit
    -0.2
    >>> round(lm.logprob("a", context=("a",)), 1)   # backoff + unigram
    -0.8
    """

    def __init__(self, ngrams, backoffs):
        if not isinstance(ngrams, dict) or not isinstance(backoffs, dict):
            raise ValueError("Ngrams and backoffs need to be dicts")
        self.ngrams = ngrams
        self.backoffs = backoffs
        self.top_order = max(ngrams.keys())

    def logprob(self, token, context=tuple()):
        context = tuple(context)
        query_order = len(context) + 1
        if query_order > self.top_order:
            context = context[1:]
            query_order -= 1
        while query_order > 0:
            table = self.ngrams.get(query_order, {})
            if context in table and token in table[context]:
                return table[context][token]
            # back off
            backoff_table = self.backoffs.get(query_order - 1, {})
            backoff = backoff_table.get(context, 0.0) if query_order > 1 else 0.0
            if query_order == 1:
                return NEGINFINITY
            result = self._backoff_logprob(token, context[1:], query_order - 1)
            return backoff + result
        return NEGINFINITY

    def _backoff_logprob(self, token, context, order):
        table = self.ngrams.get(order, {})
        if context in table and token in table[context]:
            return table[context][token]
        if order == 1:
            return NEGINFINITY
        backoff = self.backoffs.get(order - 1, {}).get(context, 0.0)
        return backoff + self._backoff_logprob(token, context[1:], order - 1)


def ngram_evaluation_details(data, LM):
    """Per-sentence NLL details (reference ``ngram.py:preplexity helpers``)."""
    details = []
    for sentence in data:
        logprob = 0.0
        num_tokens = 0
        context = tuple()
        for token in sentence:
            lp = LM.logprob(token, context)
            logprob += lp
            num_tokens += 1
            context = (context + (token,))[-(LM.top_order - 1):] if LM.top_order > 1 else tuple()
        details.append({"neglogprob": -logprob, "num_tokens": num_tokens})
    return details


def ngram_perplexity(eval_details, logbase=10.0):
    """Aggregate perplexity (reference)."""
    nll = sum(d["neglogprob"] for d in eval_details)
    n = sum(d["num_tokens"] for d in eval_details)
    return logbase ** (nll / max(n, 1))


class CountNgramCounter:
    """Simple n-gram counting helper for training small LMs."""

    def __init__(self, order):
        self.order = order
        self.counts = [collections.Counter() for _ in range(order)]

    def add_sentence(self, tokens):
        for n in range(1, self.order + 1):
            for i in range(len(tokens) - n + 1):
                self.counts[n - 1][tuple(tokens[i:i + n])] += 1
