"""Golden parity for Accuracy / BinaryMetricStats / BLEUStats vs the
reference torch implementations (sacrebleu is present in this image, so
the reference BLEU path runs for real)."""
import io

import numpy as np
import pytest

import torch

from tests.conftest import import_reference_speechbrain, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference checkout not present")


def test_accuracy_matches_reference():
    import_reference_speechbrain()
    from speechbrain.utils.Accuracy import Accuracy as RefAcc
    from speechbrain.utils.Accuracy import AccuracyStats as RefStats

    from svt_speechbrain_tpu.utils.accuracy import Accuracy, AccuracyStats

    rng = np.random.default_rng(0)
    logp = rng.normal(size=(3, 7, 5)).astype(np.float32)
    tgt2 = rng.integers(0, 5, size=(3, 7))
    lens = np.array([1.0, 5 / 7, 3 / 7], np.float32)

    for length in (None, lens):
        ref = RefAcc(torch.tensor(logp), torch.tensor(tgt2),
                     None if length is None else torch.tensor(length))
        ours = Accuracy(logp, tgt2, length)
        assert ours == ref

    # 3-D targets: the (B, T) mask is repeated across the feature axis
    logp3 = rng.normal(size=(2, 6, 4, 3)).astype(np.float32)
    tgt3 = rng.integers(0, 3, size=(2, 6, 4))
    lens3 = np.array([1.0, 0.5], np.float32)
    ref3 = RefAcc(torch.tensor(logp3), torch.tensor(tgt3),
                  torch.tensor(lens3))
    ours3 = Accuracy(logp3, tgt3, lens3)
    assert ours3 == ref3

    ref_stats, our_stats = RefStats(), AccuracyStats()
    for i in range(3):
        ref_stats.append(torch.tensor(logp), torch.tensor(tgt2),
                         torch.tensor(lens))
        our_stats.append(logp, tgt2, lens)
    assert our_stats.summarize() == pytest.approx(ref_stats.summarize())


@pytest.mark.parametrize("mode", ["eer", "eer_subsampled", "fixed"])
def test_binary_metric_stats_matches_reference(mode):
    import_reference_speechbrain()
    from speechbrain.utils.metric_stats import BinaryMetricStats as RefBin

    from svt_speechbrain_tpu.utils.metric_stats import BinaryMetricStats

    rng = np.random.default_rng(3)
    scores = rng.normal(size=60).astype(np.float32)
    labels = (rng.uniform(size=60) > 0.4).astype(np.float32)
    scores += labels * 0.8          # make positives mostly higher

    ref, ours = RefBin(), BinaryMetricStats()
    for lo in range(0, 60, 20):
        ids = [f"u{i}" for i in range(lo, lo + 20)]
        ref.append(ids, torch.tensor(scores[lo:lo + 20]),
                   torch.tensor(labels[lo:lo + 20]))
        ours.append(ids, scores[lo:lo + 20], labels[lo:lo + 20])

    kwargs = {}
    if mode == "eer_subsampled":
        kwargs["max_samples"] = 7
    elif mode == "fixed":
        kwargs["threshold"] = float(np.median(scores))
    ref_summary = ref.summarize(beta=1.3, **kwargs)
    our_summary = ours.summarize(beta=1.3, **kwargs)
    assert set(our_summary) == set(ref_summary)
    for k in ref_summary:
        assert our_summary[k] == pytest.approx(float(ref_summary[k]),
                                               abs=1e-6), k


def test_bleu_stats_matches_reference():
    import_reference_speechbrain()
    from speechbrain.utils.bleu import BLEUStats as RefBleu

    from svt_speechbrain_tpu.utils.bleu import BLEUStats

    i2l = {0: "the", 1: "cat", 2: "sat", 3: "on", 4: "mat", 5: "dog"}
    ind2lab = lambda batch: [[i2l[int(x)] for x in seq] for seq in batch]

    batches = [
        (["u1", "u2"],
         [[0, 1, 2, 3, 0, 4], [5, 2]],
         [[[0, 1, 2, 3, 0, 4], [0, 5, 2]],
          [[0, 1, 2], [5, 2, 3]]]),
        (["u3"],
         [[0, 5, 2, 3, 0, 4]],
         [[[0, 1, 2, 3, 0, 4]], [[0, 5, 1]]]),
    ]

    ref, ours = RefBleu(), BLEUStats()
    for ids, pred, tgts in batches:
        ref.append(ids, pred, tgts, ind2lab=ind2lab)
        ours.append(ids, pred, tgts, ind2lab=ind2lab)

    ref_summary = ref.summarize()
    our_summary = ours.summarize()
    for k in ("BLEU", "BP", "ratio", "hyp_len", "ref_len", "bleu_score"):
        assert our_summary[k] == pytest.approx(ref_summary[k]), k
    assert list(our_summary["precisions"]) == \
        pytest.approx(list(ref_summary["precisions"]))

    ref_out, our_out = io.StringIO(), io.StringIO()
    ref.write_stats(ref_out)
    ours.write_stats(our_out)
    assert our_out.getvalue() == ref_out.getvalue()
