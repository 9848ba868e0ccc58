"""Decoding: CTC, seq2seq beam search, transducer search."""

from svt_speechbrain_tpu.decoders.ctc import ctc_greedy_decode, filter_ctc_output, CTCPrefixScorer  # noqa: F401
from svt_speechbrain_tpu.decoders.seq2seq import (  # noqa: F401
    S2SGreedySearcher, S2SBeamSearcher, S2SRNNGreedySearcher,
    S2SRNNBeamSearcher, S2SRNNBeamSearchLM, S2SRNNBeamSearchTransformerLM,
    S2STransformerBeamSearch, filter_seq2seq_output, batch_filter_seq2seq_output,
)
from svt_speechbrain_tpu.decoders.transducer import TransducerBeamSearcher  # noqa: F401
