"""Edit-distance / WER utilities (analogue of reference
``speechbrain/utils/edit_distance.py``). Host-side numpy/python — scoring is
off the device hot path."""
from __future__ import annotations

import collections

EDIT_SYMBOLS = {"eq": "=", "ins": "I", "del": "D", "sub": "S"}


def accumulatable_wer_stats(refs, hyps, stats=None):
    """Accumulate WER counts over batches (reference ``edit_distance.py:20``).

    Returns dict with insertions/deletions/substitutions/num_ref_tokens/
    num_scored_sents (+ WER/SER when queried).

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
    updates = _batch_stats(refs, hyps)
    stats = collections.Counter(stats) + updates
    if stats["num_ref_tokens"] > 0:
        stats["WER"] = 100.0 * (stats["insertions"] + stats["deletions"]
                                + stats["substitutions"]) / stats["num_ref_tokens"]
    if stats["num_scored_sents"] > 0:
        stats["SER"] = 100.0 * stats["num_erroneous_sents"] / stats["num_scored_sents"]
    return stats


def _batch_stats(refs, hyps):
    stats = collections.Counter()
    for ref, hyp in zip(refs, hyps):
        table = op_table(ref, hyp)
        edits = count_ops(table)
        stats += collections.Counter(edits)
        stats["num_ref_tokens"] += len(ref)
        stats["num_scored_sents"] += 1
        if edits["insertions"] + edits["deletions"] + edits["substitutions"] > 0:
            stats["num_erroneous_sents"] += 1
    return stats


def op_table(a, b):
    """Edit-op table via dynamic programming (reference ``:145``).
    Returns a (len(a)+1, len(b)+1) table of EDIT_SYMBOLS."""
    table = [[EDIT_SYMBOLS["eq"] for _ in range(len(b) + 1)]
             for _ in range(len(a) + 1)]
    prev_row = list(range(len(b) + 1))
    curr_row = [0] * (len(b) + 1)

    for j in range(len(b) + 1):
        if j > 0:
            table[0][j] = EDIT_SYMBOLS["ins"]
    for i in range(1, len(a) + 1):
        table[i][0] = EDIT_SYMBOLS["del"]

    for i in range(1, len(a) + 1):
        curr_row[0] = i
        for j in range(1, len(b) + 1):
            sub_cost = prev_row[j - 1] + (0 if a[i - 1] == b[j - 1] else 1)
            ins_cost = curr_row[j - 1] + 1
            del_cost = prev_row[j] + 1
            best = min(sub_cost, ins_cost, del_cost)
            curr_row[j] = best
            if best == sub_cost:
                table[i][j] = (EDIT_SYMBOLS["eq"] if a[i - 1] == b[j - 1]
                               else EDIT_SYMBOLS["sub"])
            elif best == ins_cost:
                table[i][j] = EDIT_SYMBOLS["ins"]
            else:
                table[i][j] = EDIT_SYMBOLS["del"]
        prev_row, curr_row = curr_row, prev_row
    return table


def alignment(table):
    """Backtrace the op table → [(op, ref_idx|None, hyp_idx|None)]
    (reference ``:214``)."""
    i = len(table) - 1
    j = len(table[0]) - 1
    out = []
    while not (i == 0 and j == 0):
        if i == 0:
            out.append((EDIT_SYMBOLS["ins"], None, j - 1))
            j -= 1
        elif j == 0:
            out.append((EDIT_SYMBOLS["del"], i - 1, None))
            i -= 1
        else:
            op = table[i][j]
            if op == EDIT_SYMBOLS["ins"]:
                out.append((op, None, j - 1))
                j -= 1
            elif op == EDIT_SYMBOLS["del"]:
                out.append((op, i - 1, None))
                i -= 1
            else:
                out.append((op, i - 1, j - 1))
                i -= 1
                j -= 1
    out.reverse()
    return out


def count_ops(table):
    """Count I/D/S from the op table by backtracing (reference ``:276``)."""
    edits = collections.Counter({"insertions": 0, "deletions": 0, "substitutions": 0})
    for op, _, _ in alignment(table):
        if op == EDIT_SYMBOLS["ins"]:
            edits["insertions"] += 1
        elif op == EDIT_SYMBOLS["del"]:
            edits["deletions"] += 1
        elif op == EDIT_SYMBOLS["sub"]:
            edits["substitutions"] += 1
    return edits


def wer_details_for_batch(ids, refs, hyps, compute_alignments=False):
    """Per-utterance WER details (reference ``:334``)."""
    details = []
    for id_, ref, hyp in zip(ids, refs, hyps):
        table = op_table(ref, hyp)
        ops = count_ops(table)
        num_edits = ops["insertions"] + ops["deletions"] + ops["substitutions"]
        detail = {
            "key": id_,
            "scored": True,
            "hyp_absent": hyp is None,
            "hyp_empty": len(hyp) == 0,
            "num_edits": num_edits,
            "num_ref_tokens": len(ref),
            "WER": 100.0 * num_edits / max(len(ref), 1),
            "insertions": ops["insertions"],
            "deletions": ops["deletions"],
            "substitutions": ops["substitutions"],
            "alignment": alignment(table) if compute_alignments else None,
            "ref_tokens": list(ref) if compute_alignments else None,
            "hyp_tokens": list(hyp) if compute_alignments else None,
        }
        details.append(detail)
    return details


def wer_summary(details_by_utterance):
    """Aggregate per-utterance details (reference ``:478``)."""
    ins = dels = subs = 0
    num_scored_tokens = num_scored_sents = num_erraneous_sents = 0
    for dets in details_by_utterance:
        if dets["scored"]:
            num_scored_sents += 1
            num_scored_tokens += dets["num_ref_tokens"]
            ins += dets["insertions"]
            dels += dets["deletions"]
            subs += dets["substitutions"]
            if dets["num_edits"] > 0:
                num_erraneous_sents += 1
    wer_details = {
        "WER": 100.0 * (ins + dels + subs) / max(num_scored_tokens, 1),
        "SER": 100.0 * num_erraneous_sents / max(num_scored_sents, 1),
        "num_edits": ins + dels + subs,
        "num_scored_tokens": num_scored_tokens,
        "num_scored_sents": num_scored_sents,
        "num_erraneous_sents": num_erraneous_sents,
        "insertions": ins,
        "deletions": dels,
        "substitutions": subs,
    }
    return wer_details


def wer_details_by_utterance(ref_dict, hyp_dict, compute_alignments=False,
                             scoring_mode="strict"):
    """Per-utterance WER details from id → token-list dicts
    (reference ``edit_distance.py:391``). ``scoring_mode``: "strict" raises
    on missing hyps, "present" skips them, "all" scores them empty."""
    details = []
    for utt_id, ref in ref_dict.items():
        if utt_id not in hyp_dict:
            if scoring_mode == "strict":
                raise KeyError(f"Missing hypothesis for {utt_id}")
            if scoring_mode == "present":
                continue
            hyp = []
        else:
            hyp = hyp_dict[utt_id]
        d = wer_details_for_batch([utt_id], [ref], [hyp],
                                  compute_alignments=compute_alignments)[0]
        details.append(d)
    return details


def wer_details_by_speaker(details_by_utterance, utt2spk):
    """Group utterance details per speaker (reference
    ``edit_distance.py:476``): returns spk → accumulated stats dict."""
    by_spk = {}
    for d in details_by_utterance:
        spk = utt2spk.get(d["key"], "unknown")
        s = by_spk.setdefault(spk, {
            "speaker": spk, "num_edits": 0, "num_ref_tokens": 0,
            "insertions": 0, "deletions": 0, "substitutions": 0,
            "num_scored_sentences": 0})
        s["num_scored_sentences"] += 1
        for k_out, k_in in (("insertions", "insertions"),
                            ("deletions", "deletions"),
                            ("substitutions", "substitutions"),
                            ("num_edits", "num_edits"),
                            ("num_ref_tokens", "num_ref_tokens")):
            s[k_out] += d[k_in]
    for s in by_spk.values():
        s["WER"] = 100.0 * s["num_edits"] / max(s["num_ref_tokens"], 1)
    return by_spk


def top_wer_utts(details_by_utterance, top_k=20):
    """Worst-WER utterances (reference ``edit_distance.py:548``)."""
    scored = [d for d in details_by_utterance if d.get("num_ref_tokens")]
    return sorted(scored, key=lambda d: -d["WER"])[:top_k]


def top_wer_spks(details_by_speaker, top_k=10):
    """Worst-WER speakers (reference ``edit_distance.py:580``)."""
    return sorted(details_by_speaker.values(), key=lambda d: -d["WER"])[:top_k]
