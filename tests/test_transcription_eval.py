"""Scorer tests: hand-computable cases for the mir_eval-compatible metrics."""
import numpy as np

from svt_speechbrain_tpu.utils import transcription_eval as te


def test_midi_to_hz():
    assert abs(te.midi_to_hz(69) - 440.0) < 1e-9
    assert abs(te.midi_to_hz(57) - 220.0) < 1e-9


def test_perfect_match():
    ref_i = np.array([[0.0, 1.0], [1.5, 2.0], [3.0, 3.6]])
    ref_p = te.midi_to_hz(np.array([60, 64, 67]))
    scores = te.evaluate(ref_i, ref_p, ref_i.copy(), ref_p.copy())
    for key in ("F-measure", "F-measure_no_offset", "Onset_F-measure", "Offset_F-measure"):
        assert scores[key] == 1.0


def test_empty_estimate():
    ref_i = np.array([[0.0, 1.0]])
    ref_p = te.midi_to_hz(np.array([60]))
    scores = te.evaluate(ref_i, ref_p, np.zeros((0, 2)), np.zeros((0,)))
    assert scores["F-measure"] == 0.0
    assert scores["Precision"] == 0.0
    assert scores["Recall"] == 0.0


def test_onset_tolerance_boundary():
    ref_i = np.array([[1.0, 2.0]])
    ref_p = te.midi_to_hz(np.array([60]))
    # 49 ms off → matches (<=), 60 ms off → no match
    est_i = np.array([[1.049, 2.0]])
    assert te.evaluate(ref_i, ref_p, est_i, ref_p)["Onset_F-measure"] == 1.0
    est_i = np.array([[1.06, 2.0]])
    assert te.evaluate(ref_i, ref_p, est_i, ref_p)["Onset_F-measure"] == 0.0


def test_pitch_tolerance_50_cents():
    ref_i = np.array([[1.0, 2.0]])
    ref_p = te.midi_to_hz(np.array([60.0]))
    est_half_up = te.midi_to_hz(np.array([60.49]))  # 49 cents sharp
    est_too_sharp = te.midi_to_hz(np.array([60.6]))
    assert te.evaluate(ref_i, ref_p, ref_i, est_half_up)["F-measure_no_offset"] == 1.0
    assert te.evaluate(ref_i, ref_p, ref_i, est_too_sharp)["F-measure_no_offset"] == 0.0
    # but onset-only still matches
    assert te.evaluate(ref_i, ref_p, ref_i, est_too_sharp)["Onset_F-measure"] == 1.0


def test_offset_tolerance_scales_with_duration():
    ref_p = te.midi_to_hz(np.array([60]))
    # 1 s note → offset tol = max(0.05, 0.2*1.0) = 0.2
    ref_i = np.array([[0.0, 1.0]])
    assert te.evaluate(ref_i, ref_p, np.array([[0.0, 1.19]]), ref_p)["F-measure"] == 1.0
    assert te.evaluate(ref_i, ref_p, np.array([[0.0, 1.25]]), ref_p)["F-measure"] == 0.0
    # 0.1 s note → tol = max(0.05, 0.02) = 0.05
    ref_i = np.array([[0.0, 0.1]])
    assert te.evaluate(ref_i, ref_p, np.array([[0.0, 0.14]]), ref_p)["F-measure"] == 1.0
    assert te.evaluate(ref_i, ref_p, np.array([[0.0, 0.16]]), ref_p)["F-measure"] == 0.0


def test_each_ref_matches_at_most_one_est():
    """Two est notes near one ref onset: precision suffers."""
    ref_i = np.array([[1.0, 2.0]])
    ref_p = te.midi_to_hz(np.array([60]))
    est_i = np.array([[0.99, 2.0], [1.01, 2.0]])
    est_p = te.midi_to_hz(np.array([60, 60]))
    s = te.evaluate(ref_i, ref_p, est_i, est_p)
    assert s["Onset_Recall"] == 1.0
    assert s["Onset_Precision"] == 0.5


def test_bipartite_matching_maximizes():
    """Greedy would fail this: ref0 can match est0/est1, ref1 only est0 —
    maximum matching pairs ref0→est1, ref1→est0."""
    ref_i = np.array([[1.0, 2.0], [0.96, 1.9]])
    ref_p = te.midi_to_hz(np.array([60, 60]))
    est_i = np.array([[0.98, 1.95], [1.04, 2.05]])
    est_p = te.midi_to_hz(np.array([60, 60]))
    s = te.evaluate(ref_i, ref_p, est_i, est_p)
    assert s["Onset_F-measure"] == 1.0


def test_f_measure_formula():
    ref_i = np.array([[0.0, 1.0], [2.0, 3.0]])
    ref_p = te.midi_to_hz(np.array([60, 62]))
    est_i = np.array([[0.0, 1.0], [5.0, 6.0], [7.0, 8.0]])
    est_p = te.midi_to_hz(np.array([60, 62, 64]))
    s = te.evaluate(ref_i, ref_p, est_i, est_p)
    p, r = 1 / 3, 1 / 2
    assert abs(s["Precision"] - p) < 1e-9
    assert abs(s["Recall"] - r) < 1e-9
    assert abs(s["F-measure"] - 2 * p * r / (p + r)) < 1e-9
