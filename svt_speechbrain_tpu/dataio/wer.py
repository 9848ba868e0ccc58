"""WER output formatting (analogue of reference ``speechbrain/dataio/wer.py``):
Kaldi-style summary and per-utterance alignment printing."""
from __future__ import annotations

from svt_speechbrain_tpu.utils import edit_distance


def print_wer_summary(wer_details, file=None):
    """Print the global WER summary line (reference ``wer.py:16``).

    Example
    -------
    >>> from svt_speechbrain_tpu.utils.edit_distance import (
    ...     wer_details_for_batch, wer_summary)
    >>> details = wer_details_for_batch(["u1"], [["a", "b"]], [["a", "c"]])
    >>> print_wer_summary(wer_summary(details))
    %WER 50.00 [ 1 / 2, 0 ins, 0 del, 1 sub ]
    %SER 100.00 [ 1 / 1 ]
    """
    import sys

    file = file or sys.stdout
    print(
        "%WER {WER:.2f} [ {num_edits} / {num_scored_tokens}, {insertions} ins, "
        "{deletions} del, {substitutions} sub ]".format(**wer_details),
        file=file)
    print("%SER {SER:.2f} [ {num_erraneous_sents} / {num_scored_sents} ]".format(
        **wer_details), file=file)


def print_alignments(details_by_utterance, file=None, empty_symbol="<eps>",
                     separator=" ; "):
    """Per-utterance aligned ref/hyp/op lines (reference ``wer.py:55``)."""
    import sys

    file = file or sys.stdout
    print("=" * 80, file=file)
    for dets in details_by_utterance:
        if dets.get("alignment") is None:
            continue
        print(dets["key"], "%WER {WER:.2f} [ {num_edits} / {num_ref_tokens}, "
              "{insertions} ins, {deletions} del, {substitutions} sub ]".format(**dets),
              file=file)
        ref = dets["ref_tokens"]
        hyp = dets["hyp_tokens"]
        ref_line, op_line, hyp_line = [], [], []
        for op, i, j in dets["alignment"]:
            r = str(ref[i]) if i is not None else empty_symbol
            h = str(hyp[j]) if j is not None else empty_symbol
            width = max(len(r), len(h), len(op))
            ref_line.append(r.center(width))
            op_line.append(op.center(width))
            hyp_line.append(h.center(width))
        print(separator.join(ref_line), file=file)
        print(separator.join(op_line), file=file)
        print(separator.join(hyp_line), file=file)
        print("=" * 80, file=file)
