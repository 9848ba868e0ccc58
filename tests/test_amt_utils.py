"""Golden tests: our AMT label/decode utilities must agree exactly with the
reference implementation (``/root/reference/MIR_ST500/utils.py``) over
randomized inputs. The reference module is numpy-only, so we import it
directly when the reference checkout is present."""
import importlib.util
import sys

import numpy as np
import pytest

from svt_speechbrain_tpu.utils import amt
from tests.conftest import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")


@pytest.fixture(scope="module")
def ref_utils():
    spec = importlib.util.spec_from_file_location(
        "ref_amt_utils", "/root/reference/MIR_ST500/utils.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def random_notes(rng, n_notes, max_t=20.0):
    onsets = np.sort(rng.uniform(0, max_t, n_notes))
    notes = []
    t = 0.0
    for on in onsets:
        on = max(on, t + 0.01)
        dur = rng.uniform(0.05, 1.0)
        notes.append([on, on + dur, int(rng.integers(30, 90))])
        t = on + dur
    return notes


@pytest.mark.parametrize("seed", range(5))
def test_note2frame_matches_reference(ref_utils, seed):
    rng = np.random.default_rng(seed)
    notes = random_notes(rng, 30)
    length = int(22 * 49.8)
    ours = amt.note2frame(notes, length)
    theirs = ref_utils.note2frame(notes, length)
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("seed", range(5))
def test_note2frame_pitch_shift(ref_utils, seed):
    rng = np.random.default_rng(100 + seed)
    notes = random_notes(rng, 10)
    ours = amt.note2frame(notes, 500, pitch_shift=3)
    theirs = ref_utils.note2frame(notes, 500, pitch_shift=3)
    np.testing.assert_array_equal(ours, theirs)


def random_frame_info(rng, n):
    frame_info = []
    for _ in range(n):
        frame_info.append((
            float(rng.random()),             # onset prob
            float(rng.random()),             # offset prob
            int(rng.integers(0, 5)),         # octave idx (4 = none)
            int(rng.integers(0, 13)),        # pitch class idx (12 = none)
        ))
    return frame_info


@pytest.mark.parametrize("seed", range(8))
def test_frame2note_matches_reference(ref_utils, seed):
    rng = np.random.default_rng(seed)
    frame_info = random_frame_info(rng, 800)
    ours = amt.frame2note(frame_info, onset_thres=0.4, offset_thres=0.5)
    theirs = ref_utils.frame2note(frame_info, onset_thres=0.4, offset_thres=0.5)
    assert ours == theirs


@pytest.mark.parametrize("seed", range(4))
def test_frame2note_sparse_onsets(ref_utils, seed):
    """Realistic regime: rare onsets, confident pitch."""
    rng = np.random.default_rng(50 + seed)
    n = 1200
    onset = (rng.random(n) ** 4)  # mostly small
    offset = rng.random(n) * 0.6
    frame_info = [
        (float(onset[i]), float(offset[i]), int(rng.integers(0, 4)), int(rng.integers(0, 12)))
        for i in range(n)
    ]
    ours = amt.frame2note(frame_info, onset_thres=0.4, offset_thres=0.5)
    theirs = ref_utils.frame2note(frame_info, onset_thres=0.4, offset_thres=0.5)
    assert ours == theirs


@pytest.mark.parametrize("seed", range(3))
def test_frame2note_finegrain_matches_reference(ref_utils, seed):
    rng = np.random.default_rng(200 + seed)
    frame_info = random_frame_info(rng, 500)
    ours = amt.frame2note_finegrain(frame_info, 0.4, 0.5)
    theirs = ref_utils.frame2note_finegrain(frame_info, 0.4, 0.5)
    assert ours == theirs


def test_roundtrip_note2frame_frame2note():
    """Clean synthetic notes survive a label → decode roundtrip."""
    notes = [[0.5, 1.0, 60], [1.5, 2.2, 64], [3.0, 3.5, 55]]
    frames = amt.note2frame(notes, 250)
    frame_info = [(float(f[0]), float(f[1]), int(f[2]), int(f[3])) for f in frames]
    decoded = amt.frame2note(frame_info, onset_thres=0.4, offset_thres=0.5)
    assert len(decoded) == 3
    for (on, off, midi), ref in zip(decoded, notes):
        assert abs(on - ref[0]) < 0.05
        assert midi == ref[2]


def test_frame2note_fast_bit_identical_including_ties():
    """The vectorized decoder equals the exact one on random streams AND on
    engineered majority-vote ties (same CPython set-iteration tie-break)."""
    from svt_speechbrain_tpu.utils.amt import frame2note, frame2note_fast

    rng = np.random.default_rng(123)
    for trial in range(30):
        n = int(rng.integers(5, 400))
        frames = np.stack([
            rng.random(n),                      # onset probs
            rng.random(n),                      # offset probs
            rng.integers(0, 5, n).astype(float),
            rng.integers(0, 13, n).astype(float),
        ], axis=-1)
        exact = frame2note(frames, 0.5, 0.5)
        fast = frame2note_fast(frames, 0.5, 0.5)
        assert fast == exact, trial

    # engineered tie: one note with exactly equal votes for two pitches
    frames = np.zeros((12, 4))
    frames[:, 1] = 0.0
    frames[0, 0] = 0.9            # single onset peak at frame 0
    frames[:, 2] = 1.0            # octave 1
    frames[0:3, 3] = 2.0          # pitch class 2 × 3 votes
    frames[3:6, 3] = 7.0          # pitch class 7 × 3 votes
    frames[6:, 2] = 4.0           # none-bin: no further votes
    exact = frame2note(frames, 0.5, 0.5)
    fast = frame2note_fast(frames, 0.5, 0.5)
    assert len(exact) == 1
    assert fast == exact
