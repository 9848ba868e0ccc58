"""Edit-distance / WER utilities (analogue of reference
``speechbrain/utils/edit_distance.py``). Host-side python — scoring is off
the device hot path.

Reference-exact (golden-tested in ``tests/test_edit_distance_golden.py``),
including the Kaldi compute-wer tie-breaking (ties prefer insertion >
deletion > substitution — so the op BREAKDOWN matches Kaldi, not just the
total edit distance), the sparse ``count_ops`` counters, the per-utterance
detail schema with its unscored placeholders, and ``top_wer_utts``'s
(non-empty, empty) pair.
"""
from __future__ import annotations

import collections

EDIT_SYMBOLS = {"eq": "=", "ins": "I", "del": "D", "sub": "S"}


def accumulatable_wer_stats(refs, hyps, stats=None):
    """Accumulate WER counts over batches (reference ``edit_distance.py:20``):
    returns a Counter with WER/insertions/deletions/substitutions/
    num_ref_tokens; pass the result back in to accumulate.

    Example
    -------
    >>> stats = accumulatable_wer_stats([["a", "b", "c"]], [["a", "x", "c"]])
    >>> stats["substitutions"], round(stats["WER"], 2)
    (1, 33.33)
    >>> stats = accumulatable_wer_stats([["d"]], [["d"]], stats)  # accumulate
    >>> round(stats["WER"], 2)
    25.0
    """
    if stats is None:
        stats = collections.Counter()
    updated_stats = stats + _batch_stats(refs, hyps)
    if updated_stats["num_ref_tokens"] == 0:
        updated_stats["WER"] = float("nan")
    else:
        num_edits = (updated_stats["insertions"] + updated_stats["deletions"]
                     + updated_stats["substitutions"])
        updated_stats["WER"] = (100.0 * num_edits
                                / updated_stats["num_ref_tokens"])
    return updated_stats


def _batch_stats(refs, hyps):
    if len(refs) != len(hyps):
        raise ValueError(
            "The reference and hypothesis batches are not of the same size")
    stats = collections.Counter()
    for ref_tokens, hyp_tokens in zip(refs, hyps):
        edits = count_ops(op_table(ref_tokens, hyp_tokens))
        stats += edits
        stats["num_ref_tokens"] += len(ref_tokens)
    return stats


def op_table(a, b):
    """Edit-op table via dynamic programming (reference ``:122``).
    Returns a (len(a)+1, len(b)+1) table of EDIT_SYMBOLS, with the Kaldi
    compute-wer tie order (insertion > deletion > substitution).

    Example
    -------
    >>> for row in op_table([1, 2, 3], [1, 2, 4]):
    ...     print(row)
    ['=', 'I', 'I', 'I']
    ['D', '=', 'I', 'I']
    ['D', 'D', '=', 'I']
    ['D', 'D', 'D', 'S']
    """
    prev_row = list(range(len(b) + 1))
    curr_row = [0] * (len(b) + 1)
    table = [[EDIT_SYMBOLS["eq"] for _ in range(len(b) + 1)]
             for _ in range(len(a) + 1)]
    for i in range(len(a) + 1):
        table[i][0] = EDIT_SYMBOLS["del"]
    for j in range(len(b) + 1):
        table[0][j] = EDIT_SYMBOLS["ins"]
    table[0][0] = EDIT_SYMBOLS["eq"]

    for i, a_token in enumerate(a, start=1):
        curr_row[0] += 1
        for j, b_token in enumerate(b, start=1):
            insertion_cost = curr_row[j - 1] + 1
            deletion_cost = prev_row[j] + 1
            substitution = 0 if a_token == b_token else 1
            substitution_cost = prev_row[j - 1] + substitution
            # Kaldi's tie order: substitution only when STRICTLY cheapest,
            # deletion when strictly cheaper than insertion, else insertion
            if (substitution_cost < insertion_cost
                    and substitution_cost < deletion_cost):
                curr_row[j] = substitution_cost
                if substitution:
                    table[i][j] = EDIT_SYMBOLS["sub"]
            elif deletion_cost < insertion_cost:
                curr_row[j] = deletion_cost
                table[i][j] = EDIT_SYMBOLS["del"]
            else:
                curr_row[j] = insertion_cost
                table[i][j] = EDIT_SYMBOLS["ins"]
        prev_row[:] = curr_row[:]
    return table


def alignment(table):
    """Backtrace the op table → [(op, ref_idx|None, hyp_idx|None)]
    (reference ``:212``).

    Example
    -------
    >>> table = [['I', 'I', 'I', 'I'],
    ...          ['D', '=', 'I', 'I'],
    ...          ['D', 'D', '=', 'I'],
    ...          ['D', 'D', 'D', 'S']]
    >>> alignment(table)
    [('=', 0, 0), ('=', 1, 1), ('S', 2, 2)]
    """
    out = []
    i = len(table) - 1
    j = len(table[0]) - 1
    while not (i == 0 and j == 0):
        if i == 0:
            j -= 1
            out.insert(0, (EDIT_SYMBOLS["ins"], None, j))
        elif j == 0:
            i -= 1
            out.insert(0, (EDIT_SYMBOLS["del"], i, None))
        else:
            if table[i][j] == EDIT_SYMBOLS["ins"]:
                j -= 1
                out.insert(0, (EDIT_SYMBOLS["ins"], None, j))
            elif table[i][j] == EDIT_SYMBOLS["del"]:
                i -= 1
                out.insert(0, (EDIT_SYMBOLS["del"], i, None))
            elif table[i][j] == EDIT_SYMBOLS["sub"]:
                i -= 1
                j -= 1
                out.insert(0, (EDIT_SYMBOLS["sub"], i, j))
            else:
                i -= 1
                j -= 1
                out.insert(0, (EDIT_SYMBOLS["eq"], i, j))
    return out


def count_ops(table):
    """Count I/D/S along the shortest edit path (reference ``:275``);
    returns a sparse Counter (zero counts are absent keys, like the
    reference).

    Example
    -------
    >>> table = [['I', 'I', 'I', 'I'],
    ...          ['D', '=', 'I', 'I'],
    ...          ['D', 'D', '=', 'I'],
    ...          ['D', 'D', 'D', 'S']]
    >>> count_ops(table)
    Counter({'substitutions': 1})
    """
    edits = collections.Counter()
    i = len(table) - 1
    j = len(table[0]) - 1
    while not (i == 0 and j == 0):
        if i == 0:
            edits["insertions"] += 1
            j -= 1
        elif j == 0:
            edits["deletions"] += 1
            i -= 1
        else:
            if table[i][j] == EDIT_SYMBOLS["ins"]:
                edits["insertions"] += 1
                j -= 1
            elif table[i][j] == EDIT_SYMBOLS["del"]:
                edits["deletions"] += 1
                i -= 1
            else:
                if table[i][j] == EDIT_SYMBOLS["sub"]:
                    edits["substitutions"] += 1
                i -= 1
                j -= 1
    return edits


def _batch_to_dict_format(ids, seqs):
    return dict(zip(ids, seqs))


def wer_details_for_batch(ids, refs, hyps, compute_alignments=False):
    """Convenient batch interface over ``wer_details_by_utterance``
    (reference ``:340``)."""
    refs = _batch_to_dict_format(ids, refs)
    hyps = _batch_to_dict_format(ids, hyps)
    return wer_details_by_utterance(refs, hyps,
                                    compute_alignments=compute_alignments,
                                    scoring_mode="strict")


def wer_details_by_utterance(ref_dict, hyp_dict, compute_alignments=False,
                             scoring_mode="strict"):
    """Per-utterance WER details from id → token-list dicts — the
    reference's exact schema incl. unscored placeholders (``:384``).
    ``scoring_mode``: "strict" raises on missing hyps, "present" skips
    them (keeping a placeholder entry), "all" scores them empty."""
    details_by_utterance = []
    for key, ref_tokens in ref_dict.items():
        utterance_details = {
            "key": key,
            "scored": False,
            "hyp_absent": None,
            "hyp_empty": None,
            "num_edits": None,
            "num_ref_tokens": len(ref_tokens),
            "WER": None,
            "insertions": None,
            "deletions": None,
            "substitutions": None,
            "alignment": None,
            "ref_tokens": ref_tokens if compute_alignments else None,
            "hyp_tokens": None,
        }
        if key in hyp_dict:
            utterance_details.update({"hyp_absent": False})
            hyp_tokens = hyp_dict[key]
        elif scoring_mode == "all":
            utterance_details.update({"hyp_absent": True})
            hyp_tokens = []
        elif scoring_mode == "present":
            utterance_details.update({"hyp_absent": True})
            details_by_utterance.append(utterance_details)
            continue
        elif scoring_mode == "strict":
            raise KeyError("Key " + str(key) + " in reference but missing "
                           "in hypothesis and strict mode on.")
        else:
            raise ValueError("Invalid scoring mode: " + scoring_mode)
        table = op_table(ref_tokens, hyp_tokens)
        ops = count_ops(table)
        utterance_details.update({
            "scored": True,
            "hyp_empty": len(hyp_tokens) == 0,
            "num_edits": sum(ops.values()),
            "num_ref_tokens": len(ref_tokens),
            "WER": 100.0 * sum(ops.values()) / len(ref_tokens),
            "insertions": ops["insertions"],
            "deletions": ops["deletions"],
            "substitutions": ops["substitutions"],
            "alignment": alignment(table) if compute_alignments else None,
            "ref_tokens": ref_tokens if compute_alignments else None,
            "hyp_tokens": hyp_tokens if compute_alignments else None,
        })
        details_by_utterance.append(utterance_details)
    return details_by_utterance


def wer_summary(details_by_utterance):
    """Aggregate per-utterance details (reference ``:502``): WER/SER plus
    scored/absent/erraneous counts (the reference's spelling)."""
    ins = dels = subs = 0
    num_scored_tokens = num_scored_sents = num_edits = 0
    num_erraneous_sents = num_absent_sents = num_ref_sents = 0
    for dets in details_by_utterance:
        num_ref_sents += 1
        if dets["scored"]:
            num_scored_sents += 1
            num_scored_tokens += dets["num_ref_tokens"]
            ins += dets["insertions"]
            dels += dets["deletions"]
            subs += dets["substitutions"]
            num_edits += dets["num_edits"]
            if dets["num_edits"] > 0:
                num_erraneous_sents += 1
        if dets["hyp_absent"]:
            num_absent_sents += 1
    return {
        "WER": 100.0 * num_edits / num_scored_tokens,
        "SER": 100.0 * num_erraneous_sents / num_scored_sents,
        "num_edits": num_edits,
        "num_scored_tokens": num_scored_tokens,
        "num_erraneous_sents": num_erraneous_sents,
        "num_scored_sents": num_scored_sents,
        "num_absent_sents": num_absent_sents,
        "num_ref_sents": num_ref_sents,
        "insertions": ins,
        "deletions": dels,
        "substitutions": subs,
    }


def wer_details_by_speaker(details_by_utterance, utt2spk):
    """Group utterance details per speaker (reference ``:573``): returns a
    LIST of per-speaker dicts (keys speaker/insertions/dels/subs/…; WER and
    SER None for unscored speakers)."""
    details_by_speaker = {}
    for dets in details_by_utterance:
        speaker = utt2spk[dets["key"]]
        spk_dets = details_by_speaker.setdefault(
            speaker,
            collections.Counter({
                "speaker": speaker, "insertions": 0, "dels": 0, "subs": 0,
                "num_scored_tokens": 0, "num_scored_sents": 0,
                "num_edits": 0, "num_erraneous_sents": 0,
                "num_absent_sents": 0, "num_ref_sents": 0}))
        utt_stats = collections.Counter()
        if dets["hyp_absent"]:
            utt_stats.update({"num_absent_sents": 1})
        if dets["scored"]:
            utt_stats.update({
                "num_scored_sents": 1,
                "num_scored_tokens": dets["num_ref_tokens"],
                "insertions": dets["insertions"],
                "dels": dets["deletions"],
                "subs": dets["substitutions"],
                "num_edits": dets["num_edits"]})
            if dets["num_edits"] > 0:
                utt_stats.update({"num_erraneous_sents": 1})
        spk_dets.update(utt_stats)
    details_by_speaker_dicts = []
    for speaker, spk_dets in details_by_speaker.items():
        spk_dets["speaker"] = speaker
        if spk_dets["num_scored_sents"] > 0:
            spk_dets["WER"] = (100.0 * spk_dets["num_edits"]
                               / spk_dets["num_scored_tokens"])
            spk_dets["SER"] = (100.0 * spk_dets["num_erraneous_sents"]
                               / spk_dets["num_scored_sents"])
        else:
            spk_dets["WER"] = None
            spk_dets["SER"] = None
        details_by_speaker_dicts.append(spk_dets)
    return details_by_speaker_dicts


def top_wer_utts(details_by_utterance, top_k=20):
    """Worst-WER utterances split into (non-empty, empty-hypothesis) lists
    (reference ``:666``)."""
    scored_utterances = [dets for dets in details_by_utterance
                         if dets["scored"]]
    utts_by_wer = sorted(scored_utterances, key=lambda d: d["WER"],
                         reverse=True)
    top_non_empty = []
    top_empty = []
    while utts_by_wer and (len(top_non_empty) < top_k
                           or len(top_empty) < top_k):
        utt = utts_by_wer.pop(0)
        if utt["hyp_empty"] and len(top_empty) < top_k:
            top_empty.append(utt)
        elif not utt["hyp_empty"] and len(top_non_empty) < top_k:
            top_non_empty.append(utt)
    return top_non_empty, top_empty


def top_wer_spks(details_by_speaker, top_k=10):
    """Worst-WER speakers (reference ``:709``)."""
    scored_speakers = [dets for dets in details_by_speaker
                       if dets["num_scored_sents"] > 0]
    spks_by_wer = sorted(scored_speakers, key=lambda d: d["WER"],
                         reverse=True)
    return spks_by_wer[:top_k]
