"""Decoding: CTC, seq2seq beam search, transducer search."""

from svt_speechbrain_tpu.decoders.ctc import ctc_greedy_decode, filter_ctc_output, CTCPrefixScorer  # noqa: F401
from svt_speechbrain_tpu.decoders.seq2seq import (  # noqa: F401
    S2SGreedySearcher, S2SBeamSearcher, S2SRNNGreedySearcher,
)
from svt_speechbrain_tpu.decoders.transducer import TransducerBeamSearcher  # noqa: F401
