"""Differential validation of the mir_eval-compatible transcription scorer.

The reference scores every quality number through the real
``mir_eval.transcription.evaluate`` (``MIR_ST500/train_audio_ssl.py:123-134``);
our ``utils/transcription_eval.py`` reimplements it (mir_eval is not in the
image). This file cross-checks that implementation against an INDEPENDENT
brute-force reimplementation — scalar-loop pair predicates plus exhaustive
maximum-matching search — over >=10k randomized note-set pairs whose onsets,
durations and pitches sit densely on the tolerance boundaries (exact
|on_diff| == 50 ms ties, exact 50-cent pitch ties, and the offset
``max(0.05, 0.2*ref_dur)`` crossover at dur == 0.25 s).

Checked per pair, for every key ``evaluate`` returns:
- matched-pair count == exhaustive maximum bipartite matching cardinality,
  independently recomputed for COnPOff / COnP / COn / COff;
- Precision / Recall / F-measure recomputed from that count;
- Average_Overlap_Ratio is achievable by SOME maximum matching (the value is
  matching-dependent when maximum matchings tie; mir_eval reports the one its
  Hopcroft-Karp run found).
"""
import numpy as np
import pytest

from svt_speechbrain_tpu.utils.transcription_eval import evaluate, midi_to_hz


# ---------------------------------------------------------------------------
# Independent brute-force scorer (scalar loops, exhaustive matching)
# ---------------------------------------------------------------------------

def brute_pairs(ref_ivl, ref_p, est_ivl, est_p, kind,
                onset_tol=0.05, pitch_tol=50.0, off_ratio=0.2, off_min=0.05):
    """Allowed (ref, est) pairs via per-pair scalar checks."""
    pairs = []
    for i in range(len(ref_ivl)):
        for j in range(len(est_ivl)):
            ok = True
            if kind in ("onpoff", "onp", "on"):
                ok = ok and abs(est_ivl[j][0] - ref_ivl[i][0]) <= onset_tol
            if kind in ("onpoff", "onp"):
                cents = abs(1200.0 * np.log2(est_p[j] / ref_p[i]))
                ok = ok and cents <= pitch_tol
            if kind in ("onpoff", "off"):
                tol = max(off_min, off_ratio * (ref_ivl[i][1] - ref_ivl[i][0]))
                ok = ok and abs(est_ivl[j][1] - ref_ivl[i][1]) <= tol
            if ok:
                pairs.append((i, j))
    return pairs


def brute_max_matching_size(n_ref, pairs):
    """Exhaustive maximum-cardinality matching via bitmask DP over est."""
    adj = [[] for _ in range(n_ref)]
    for i, j in pairs:
        adj[i].append(j)
    frontier = {0: 0}  # est-used mask -> best matched count
    for js in adj:
        new = dict(frontier)
        for mask, cnt in frontier.items():
            for j in js:
                bit = 1 << j
                if not mask & bit and new.get(mask | bit, -1) < cnt + 1:
                    new[mask | bit] = cnt + 1
        frontier = new
    return max(frontier.values()) if frontier else 0


def brute_all_max_matchings(n_ref, pairs, max_size):
    """Every maximum matching, as lists of (ref, est) pairs (small n only)."""
    adj = [[] for _ in range(n_ref)]
    for i, j in pairs:
        adj[i].append(j)
    out = []

    def go(i, used, acc):
        if len(acc) + (n_ref - i) < max_size:
            return  # can't reach max anymore
        if i == n_ref:
            if len(acc) == max_size:
                out.append(list(acc))
            return
        go(i + 1, used, acc)  # leave ref i unmatched
        for j in adj[i]:
            bit = 1 << j
            if not used & bit:
                acc.append((i, j))
                go(i + 1, used | bit, acc)
                acc.pop()

    go(0, 0, [])
    return out


def brute_prf(m, n_ref, n_est):
    p = m / n_est if n_est else 0.0
    r = m / n_ref if n_ref else 0.0
    f = 2 * p * r / (p + r) if p + r > 0 else 0.0
    return p, r, f


def overlap_ratio(ref_ivl, est_ivl, matching):
    if not matching:
        return 0.0
    vals = []
    for i, j in matching:
        union = max(ref_ivl[i][1], est_ivl[j][1]) - min(ref_ivl[i][0], est_ivl[j][0])
        inter = min(ref_ivl[i][1], est_ivl[j][1]) - max(ref_ivl[i][0], est_ivl[j][0])
        vals.append(inter / union if union > 0 else 0.0)
    return float(np.mean(vals))


# ---------------------------------------------------------------------------
# Boundary-dense random note-set generator
# ---------------------------------------------------------------------------

# onset grid step 25 ms => |diff| hits the 50 ms tolerance EXACTLY (0.05 and
# 0.025 are not fp-exact, but both sides subtract the same doubles);
# durations straddle the offset-rule crossover 0.2*dur vs 0.05 at dur=0.25;
# midi half-steps of 0.5 are EXACTLY 50 cents
ONSET_GRID = 0.025
DURATIONS = (0.05, 0.1, 0.25, 0.5, 1.0, 2.0)
MIDI = (60.0, 60.5, 61.0, 69.0, 69.5, 72.0)


def random_notes(rng, n_max=6, allow_empty=True):
    n = int(rng.integers(0 if allow_empty else 1, n_max + 1))
    ivl, midi = [], []
    for _ in range(n):
        on = int(rng.integers(0, 40)) * ONSET_GRID
        dur = DURATIONS[int(rng.integers(0, len(DURATIONS)))]
        ivl.append([on, on + dur])
        midi.append(MIDI[int(rng.integers(0, len(MIDI)))])
    return np.array(ivl, dtype=np.float64).reshape(n, 2), np.array(midi)


def perturbed_estimate(rng, ref_ivl, ref_midi):
    """An estimate correlated with the reference: per-note exact-boundary,
    near-boundary, or off-grid perturbations, plus insert/delete noise."""
    ivl, midi = [], []
    for (on, off), m in zip(ref_ivl, ref_midi):
        r = rng.random()
        if r < 0.15:
            continue  # deletion
        don = [0.0, 0.05, -0.05, 0.0500001, 0.025, 0.075][int(rng.integers(0, 6))]
        doff = [0.0, 0.05, -0.05, 0.2 * (off - on), 0.2 * (off - on) + 1e-7,
                0.3][int(rng.integers(0, 6))]
        dm = [0.0, 0.5, -0.5, 0.4999, 0.5001, 1.0][int(rng.integers(0, 6))]
        e_on = on + don
        e_off = max(e_on, off + doff)  # keep non-negative duration
        ivl.append([e_on, e_off])
        midi.append(m + dm)
    for _ in range(int(rng.integers(0, 3))):  # insertions
        on = int(rng.integers(0, 40)) * ONSET_GRID
        dur = DURATIONS[int(rng.integers(0, len(DURATIONS)))]
        ivl.append([on, on + dur])
        midi.append(MIDI[int(rng.integers(0, len(MIDI)))])
    n = len(ivl)
    return np.array(ivl, dtype=np.float64).reshape(n, 2), np.array(midi)


KINDS = {
    "onpoff": ("Precision", "Recall", "F-measure"),
    "onp": ("Precision_no_offset", "Recall_no_offset", "F-measure_no_offset"),
    "on": ("Onset_Precision", "Onset_Recall", "Onset_F-measure"),
    "off": ("Offset_Precision", "Offset_Recall", "Offset_F-measure"),
}


def _check_case(ref_ivl, ref_p, est_ivl, est_p):
    scores = evaluate(ref_ivl, ref_p, est_ivl, est_p)
    n_ref, n_est = len(ref_p), len(est_p)
    for kind, (pk, rk, fk) in KINDS.items():
        pairs = brute_pairs(ref_ivl, ref_p, est_ivl, est_p, kind)
        m = brute_max_matching_size(n_ref, pairs)
        p, r, f = brute_prf(m, n_ref, n_est)
        for key, want in ((pk, p), (rk, r), (fk, f)):
            assert scores[key] == pytest.approx(want, abs=1e-12), (
                kind, key, scores[key], want,
                ref_ivl.tolist(), ref_p.tolist(),
                est_ivl.tolist(), est_p.tolist())
    return scores


@pytest.mark.parametrize("seed", range(8))
def test_differential_10k_random_pairs(seed):
    """>=10k randomized boundary-dense note-set pairs, all four metric
    families vs exhaustive matching (split over 8 seeds to parallelize)."""
    rng = np.random.default_rng(1000 + seed)
    for _ in range(1250):
        ref_ivl, ref_midi = random_notes(rng)
        if rng.random() < 0.7:
            est_ivl, est_midi = perturbed_estimate(rng, ref_ivl, ref_midi)
        else:
            est_ivl, est_midi = random_notes(rng)
        _check_case(ref_ivl, midi_to_hz(ref_midi) if len(ref_midi) else ref_midi,
                    est_ivl, midi_to_hz(est_midi) if len(est_midi) else est_midi)


def test_average_overlap_ratio_achievable():
    """AOR must equal the mean IoU of SOME maximum matching (mir_eval's value
    is matching-dependent when maximum matchings tie)."""
    rng = np.random.default_rng(77)
    checked = 0
    for _ in range(600):
        ref_ivl, ref_midi = random_notes(rng, n_max=4)
        est_ivl, est_midi = perturbed_estimate(rng, ref_ivl, ref_midi)
        est_ivl, est_midi = est_ivl[:4], est_midi[:4]
        ref_p = midi_to_hz(ref_midi) if len(ref_midi) else ref_midi
        est_p = midi_to_hz(est_midi) if len(est_midi) else est_midi
        scores = evaluate(ref_ivl, ref_p, est_ivl, est_p)
        for kind, key in (("onpoff", "Average_Overlap_Ratio"),
                          ("onp", "Average_Overlap_Ratio_no_offset")):
            pairs = brute_pairs(ref_ivl, ref_p, est_ivl, est_p, kind)
            msize = brute_max_matching_size(len(ref_p), pairs)
            achievable = {
                round(overlap_ratio(ref_ivl, est_ivl, mm), 12)
                for mm in brute_all_max_matchings(len(ref_p), pairs, msize)
            } or {0.0}
            assert round(scores[key], 12) in achievable, (kind, scores[key])
            checked += 1
    assert checked == 1200


def test_edge_cases_exact():
    """Hand-computable edges: empties, duplicates, zero-duration notes,
    exact-boundary singletons."""
    empty = np.zeros((0, 2))
    enp = np.zeros((0,))
    one = np.array([[1.0, 1.5]])
    onep = midi_to_hz(np.array([69.0]))

    s = evaluate(empty, enp, empty, enp)
    assert s["F-measure"] == 0.0 and s["Onset_F-measure"] == 0.0
    s = evaluate(one, onep, empty, enp)
    assert s["Recall"] == 0.0 and s["Precision"] == 0.0
    s = evaluate(empty, enp, one, onep)
    assert s["Precision"] == 0.0

    # duplicated ref notes: two identical refs, one est -> recall 0.5
    two = np.array([[1.0, 1.5], [1.0, 1.5]])
    twop = midi_to_hz(np.array([69.0, 69.0]))
    s = evaluate(two, twop, one, onep)
    assert s["Recall"] == 0.5 and s["Precision"] == 1.0

    # exact 50 ms onset boundary is a HIT (<=, strict=False default);
    # use an fp-exact difference (0.05 - 0.0), since e.g. 1.05 - 1.0 is
    # 0.050000000000000044 in doubles and mir_eval misses it too
    zone = np.array([[0.0, 1.5]])
    est = np.array([[0.05, 1.5]])
    s = evaluate(zone, onep, est, onep)
    assert s["Onset_F-measure"] == 1.0
    # 49.99 cents is a HIT; 50.01 cents is a MISS (the exact-50 boundary is
    # fp-ambiguous through the Hz round-trip — the 10k differential sweep
    # pins it to the shared |1200*log2(est/ref)| <= tol formula)
    s = evaluate(one, onep, one, onep * 2 ** (49.99 / 1200.0))
    assert s["F-measure_no_offset"] == 1.0
    s = evaluate(one, onep, one, onep * 2 ** (50.01 / 1200.0))
    assert s["F-measure_no_offset"] == 0.0

    # offset rule: dur 1.0 -> tol max(0.05, 0.2) = 0.2; 0.2 hits, 0.21 misses
    ref = np.array([[0.0, 1.0]])
    s = evaluate(ref, onep, np.array([[0.0, 1.2]]), onep)
    assert s["Offset_F-measure"] == 1.0 and s["F-measure"] == 1.0
    s = evaluate(ref, onep, np.array([[0.0, 1.21]]), onep)
    assert s["Offset_F-measure"] == 0.0 and s["F-measure"] == 0.0
    # dur 0.1 -> tol max(0.05, 0.02) = 0.05 (the min-tolerance floor)
    ref = np.array([[0.0, 0.1]])
    s = evaluate(ref, onep, np.array([[0.0, 0.15]]), onep)
    assert s["Offset_F-measure"] == 1.0
    s = evaluate(ref, onep, np.array([[0.0, 0.151]]), onep)
    assert s["Offset_F-measure"] == 0.0

    # zero-duration notes: offset tol floor still applies, IoU guard (0/0)
    zref = np.array([[1.0, 1.0]])
    s = evaluate(zref, onep, zref, onep)
    assert s["F-measure"] == 1.0 and s["Average_Overlap_Ratio"] == 0.0


def test_matching_is_maximum_not_greedy():
    """A case where greedy first-come matching under-counts: ref A can match
    est 1 or 2, ref B only est 1 — maximum matching is 2 (A-2, B-1)."""
    # onsets: A=1.000, B=1.040; est1=1.045, est2=1.050
    # A-est1 |0.045|<=0.05 ok, A-est2 |0.05| ok; B-est1 |0.005| ok,
    # B-est2 |0.01| ok... need est2 NOT matching B: est2-B=0.01 -> matches.
    # Use pitch to break instead: B and est2 a tritone apart.
    ref = np.array([[1.0, 2.0], [1.04, 2.0]])
    refp = midi_to_hz(np.array([69.0, 69.0]))
    est = np.array([[1.045, 2.0], [1.05, 2.0]])
    estp = midi_to_hz(np.array([69.0, 69.0]))
    # both est match both ref on onset+pitch; now pin est2 away from B:
    estp2 = midi_to_hz(np.array([69.0, 69.0]))
    refp2 = midi_to_hz(np.array([69.0, 75.0]))  # B far in pitch from both
    s = evaluate(ref, refp, est, estp)
    assert s["F-measure_no_offset"] == 1.0  # perfect 2-matching exists
    # A matches est1+est2, B matches neither (pitch) -> max matching 1
    s = evaluate(ref, refp2, est, estp2)
    assert s["Precision_no_offset"] == 0.5 and s["Recall_no_offset"] == 0.5
