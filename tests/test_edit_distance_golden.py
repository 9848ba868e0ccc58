"""Golden parity for WER/edit-distance utilities vs the reference
``speechbrain/utils/edit_distance.py`` (pure Python): randomized sweep over
op tables (incl. Kaldi tie-breaking), alignments, op counts, accumulated
batch stats, per-utterance/speaker details, summaries, and top-K lists."""
import collections
import random

import numpy as np
import pytest

from tests.conftest import import_reference_speechbrain, reference_available

from svt_speechbrain_tpu.utils import edit_distance as oed

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference checkout not present")


def _ref():
    import_reference_speechbrain()
    from speechbrain.utils import edit_distance as red
    return red


def _rand_seq(rng, min_len=0, max_len=8):
    return [rng.choice("abcdefg") for _ in range(rng.randint(min_len, max_len))]


def test_op_table_alignment_counts_random_sweep():
    red = _ref()
    rng = random.Random(0)
    for _ in range(200):
        a, b = _rand_seq(rng), _rand_seq(rng)
        rt, ot = red.op_table(a, b), oed.op_table(a, b)
        assert ot == rt, (a, b)
        assert oed.alignment(ot) == red.alignment(rt), (a, b)
        assert oed.count_ops(ot) == red.count_ops(rt), (a, b)


def test_accumulatable_stats_match_reference():
    red = _ref()
    rng = random.Random(1)
    r_stats = collections.Counter()
    o_stats = collections.Counter()
    for _ in range(10):
        refs = [_rand_seq(rng, 1) for _ in range(4)]
        hyps = [_rand_seq(rng) for _ in range(4)]
        r_stats = red.accumulatable_wer_stats(refs, hyps, r_stats)
        o_stats = oed.accumulatable_wer_stats(refs, hyps, o_stats)
        assert dict(o_stats) == dict(r_stats)
    # empty accumulation: WER must be NaN on both sides
    assert np.isnan(red.accumulatable_wer_stats([], [])["WER"])
    assert np.isnan(oed.accumulatable_wer_stats([], [])["WER"])


def test_details_summary_speaker_topk_match_reference():
    red = _ref()
    rng = random.Random(2)
    ids = [f"u{i}" for i in range(6)]
    refs = [_rand_seq(rng, 1) for _ in ids]
    hyps = [_rand_seq(rng) for _ in ids]

    r_det = red.wer_details_for_batch(ids, refs, hyps, compute_alignments=True)
    o_det = oed.wer_details_for_batch(ids, refs, hyps, compute_alignments=True)
    assert o_det == r_det

    assert oed.wer_summary(o_det) == red.wer_summary(r_det)

    utt2spk = {f"u{i}": f"s{i % 2}" for i in range(6)}
    r_spk = red.wer_details_by_speaker(r_det, utt2spk)
    o_spk = oed.wer_details_by_speaker(o_det, utt2spk)
    assert [dict(d) for d in o_spk] == [dict(d) for d in r_spk]

    assert oed.top_wer_utts(o_det, top_k=3) == red.top_wer_utts(r_det, top_k=3)
    assert (oed.top_wer_spks(o_spk, top_k=1)
            == red.top_wer_spks(r_spk, top_k=1))


def test_wer_printers_match_reference_bytes():
    import io

    red = _ref()
    import_reference_speechbrain()
    from speechbrain.dataio import wer as rwer

    from svt_speechbrain_tpu.dataio import wer as ower

    ids = ["u1", "u2", "u3"]
    refs = [["the", "cat", "sat"], ["a", "dog"], ["hi"]]
    hyps = [["the", "cat"], ["a", "dug", "x"], []]
    det = red.wer_details_for_batch(ids, refs, hyps, compute_alignments=True)

    r_buf, o_buf = io.StringIO(), io.StringIO()
    rwer.print_wer_summary(red.wer_summary(det), file=r_buf)
    ower.print_wer_summary(oed.wer_summary(det), file=o_buf)
    assert o_buf.getvalue() == r_buf.getvalue()

    r_buf, o_buf = io.StringIO(), io.StringIO()
    rwer.print_alignments(det, file=r_buf)
    ower.print_alignments(det, file=o_buf)
    assert o_buf.getvalue() == r_buf.getvalue()

    r_ne, r_e = red.top_wer_utts(det, top_k=2)
    r_buf, o_buf = io.StringIO(), io.StringIO()
    rwer._print_top_wer_utts(r_ne, r_e, file=r_buf)
    ower._print_top_wer_utts(r_ne, r_e, file=o_buf)
    assert o_buf.getvalue() == r_buf.getvalue()

    spk = red.wer_details_by_speaker(det, {"u1": "A", "u2": "B", "u3": "A"})
    r_buf, o_buf = io.StringIO(), io.StringIO()
    rwer._print_top_wer_spks(red.top_wer_spks(spk), file=r_buf)
    ower._print_top_wer_spks(oed.top_wer_spks(spk), file=o_buf)
    assert o_buf.getvalue() == r_buf.getvalue()


def test_eer_mindcf_match_reference():
    import numpy as np
    import torch

    import_reference_speechbrain()
    from speechbrain.utils import metric_stats as rms

    from svt_speechbrain_tpu.utils import metric_stats as oms

    rng = np.random.default_rng(0)
    for trial in range(5):
        pos = rng.normal(loc=1.0, size=40).astype(np.float32)
        neg = rng.normal(loc=-1.0, size=60).astype(np.float32)
        r_eer, r_thr = rms.EER(torch.tensor(pos), torch.tensor(neg))
        o_eer, o_thr = oms.EER(pos, neg)
        assert abs(o_eer - r_eer) < 1e-6 and abs(o_thr - r_thr) < 1e-6
        r_dcf, r_dthr = rms.minDCF(torch.tensor(pos), torch.tensor(neg),
                                   c_miss=1.5, c_fa=0.5, p_target=0.05)
        o_dcf, o_dthr = oms.minDCF(pos, neg, c_miss=1.5, c_fa=0.5,
                                   p_target=0.05)
        assert abs(o_dcf - r_dcf) < 1e-6 and abs(o_dthr - r_dthr) < 1e-6


def test_scoring_modes_match_reference():
    red = _ref()
    ref_dict = {"u1": ["a", "b"], "u2": ["c"]}
    hyp_dict = {"u1": ["a", "x"]}

    for mode in ("all", "present"):
        r = red.wer_details_by_utterance(ref_dict, hyp_dict,
                                         compute_alignments=True,
                                         scoring_mode=mode)
        o = oed.wer_details_by_utterance(ref_dict, hyp_dict,
                                         compute_alignments=True,
                                         scoring_mode=mode)
        assert o == r, mode
    with pytest.raises(KeyError):
        oed.wer_details_by_utterance(ref_dict, hyp_dict, scoring_mode="strict")
    with pytest.raises(KeyError):
        red.wer_details_by_utterance(ref_dict, hyp_dict, scoring_mode="strict")
