"""Golden parity for the PLDA estimator and scorer vs the reference
``speechbrain/processing/PLDA_LDA.py`` (pure numpy/scipy — imported
directly). Verifies the EM trajectory (mean, F, Sigma after every
iteration count), the fast scoring (Phi/Psi parts, duplicate-model
averaging, trial alignment), and the open-set correction."""
import numpy as np
import pytest

from tests.conftest import import_reference_speechbrain, reference_available

from svt_speechbrain_tpu.processing.plda_lda import (
    Ndx, PLDA, StatObject_SB, fast_PLDA_scoring)

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference checkout not present")


def _dataset(seed=0, dim=8, rank=3, n_spk=6, per_spk=7):
    rng = np.random.default_rng(seed)
    F = rng.normal(size=(dim, rank))
    means = rng.normal(size=(n_spk, rank)) @ F.T
    x = np.concatenate([means[s] + 0.4 * rng.normal(size=(per_spk, dim))
                        for s in range(n_spk)])
    labels = np.array([f"s{s}" for s in range(n_spk) for _ in range(per_spk)],
                      dtype="|O")
    segs = np.array([f"u{i}" for i in range(len(x))], dtype="|O")
    return x, labels, segs, means


def _ref_statobject(ref_mod, x, labels, segs):
    n = len(x)
    return ref_mod.StatObject_SB(
        modelset=labels, segset=segs,
        start=np.array([None] * n), stop=np.array([None] * n),
        stat0=np.ones((n, 1)), stat1=x.copy())


def _ref_plda_module():
    import_reference_speechbrain()
    from speechbrain.processing import PLDA_LDA as ref_mod
    return ref_mod


@pytest.mark.parametrize("nb_iter", [1, 2, 5])
def test_plda_em_trajectory_matches_reference(nb_iter):
    ref_mod = _ref_plda_module()
    x, labels, segs, _ = _dataset()

    ref = ref_mod.PLDA(rank_f=3, nb_iter=nb_iter)
    ref.plda(_ref_statobject(ref_mod, x, labels, segs))

    ours = PLDA(rank_f=3, nb_iter=nb_iter)
    ours.plda(StatObject_SB(modelset=labels, segset=segs,
                            stat0=np.ones((len(x), 1)), stat1=x.copy()))

    np.testing.assert_allclose(ours.mean, ref.mean, rtol=1e-10)
    np.testing.assert_allclose(ours.F, ref.F, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(ours.Sigma, ref.Sigma, rtol=1e-8, atol=1e-10)


def test_plda_scaling_factor_matches_reference():
    ref_mod = _ref_plda_module()
    x, labels, segs, _ = _dataset(seed=3)
    ref = ref_mod.PLDA(rank_f=2, nb_iter=3, scaling_factor=0.5)
    ref.plda(_ref_statobject(ref_mod, x, labels, segs))
    ours = PLDA(rank_f=2, nb_iter=3, scaling_factor=0.5)
    ours.plda(StatObject_SB(modelset=labels, segset=segs,
                            stat0=np.ones((len(x), 1)), stat1=x.copy()))
    np.testing.assert_allclose(ours.F, ref.F, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(ours.Sigma, ref.Sigma, rtol=1e-8, atol=1e-10)


def _trained_pair(nb_iter=5, rank=3):
    ref_mod = _ref_plda_module()
    x, labels, segs, means = _dataset(seed=1)
    ref = ref_mod.PLDA(rank_f=rank, nb_iter=nb_iter)
    ref.plda(_ref_statobject(ref_mod, x, labels, segs))
    return ref_mod, ref, means


def _enroll_test_sets(ref_mod, means, dup_models=False):
    rng = np.random.default_rng(9)
    dim = means.shape[1]
    en_x = means[:4] + 0.1 * rng.normal(size=(4, dim))
    te_x = means[:5] + 0.1 * rng.normal(size=(5, dim))
    en_models = np.array(
        ["e0", "e0", "e1", "e2"] if dup_models else
        ["e0", "e1", "e2", "e3"], dtype="|O")
    en_segs = np.array([f"es{i}" for i in range(4)], dtype="|O")
    te_segs = np.array([f"t{i}" for i in range(5)], dtype="|O")

    ref_en = ref_mod.StatObject_SB(
        modelset=en_models, segset=en_segs,
        start=np.array([None] * 4), stop=np.array([None] * 4),
        stat0=np.ones((4, 1)), stat1=en_x.copy())
    ref_te = ref_mod.StatObject_SB(
        modelset=te_segs, segset=te_segs,
        start=np.array([None] * 5), stop=np.array([None] * 5),
        stat0=np.ones((5, 1)), stat1=te_x.copy())
    our_en = StatObject_SB(modelset=en_models, segset=en_segs,
                           stat0=np.ones((4, 1)), stat1=en_x.copy())
    our_te = StatObject_SB(modelset=te_segs, segset=te_segs,
                           stat0=np.ones((5, 1)), stat1=te_x.copy())
    return (ref_en, ref_te, our_en, our_te, en_models, te_segs)


@pytest.mark.parametrize("p_known", [0.0, 0.3])
def test_fast_plda_scoring_matches_reference(p_known):
    ref_mod, ref, means = _trained_pair()
    (ref_en, ref_te, our_en, our_te,
     en_models, te_segs) = _enroll_test_sets(ref_mod, means)

    ref_ndx = ref_mod.Ndx(models=en_models, testsegs=te_segs)
    ref_scores = ref_mod.fast_PLDA_scoring(
        ref_en, ref_te, ref_ndx, ref.mean, ref.F, ref.Sigma, p_known=p_known)

    our_ndx = Ndx(models=en_models, testsegs=te_segs)
    our_scores = fast_PLDA_scoring(
        our_en, our_te, our_ndx, ref.mean, ref.F, ref.Sigma, p_known=p_known)

    assert list(our_scores.modelset) == list(ref_scores.modelset)
    assert list(our_scores.segset) == list(ref_scores.segset)
    np.testing.assert_array_equal(our_scores.scoremask, ref_scores.scoremask)
    np.testing.assert_allclose(our_scores.scoremat, ref_scores.scoremat,
                               rtol=1e-8, atol=1e-10)


def test_duplicate_enroll_models_average():
    """Duplicate enrollment models are averaged before scoring. The
    reference's own duplicate path is BROKEN in this checkout (its
    ``fast_PLDA_scoring`` calls ``StatObject_SB.mean_stat_per_model``, which
    does not exist — ``PLDA_LDA.py:695``); ours implements the evident
    intent: scores equal pre-averaged enrollment."""
    ref_mod, ref, means = _trained_pair()
    (_, _, our_en, our_te,
     en_models, te_segs) = _enroll_test_sets(ref_mod, means, dup_models=True)

    dup = fast_PLDA_scoring(our_en, our_te, None, ref.mean, ref.F, ref.Sigma)

    avg_x = np.stack([our_en.stat1[:2].mean(0), our_en.stat1[2],
                      our_en.stat1[3]])
    pre = StatObject_SB(modelset=np.array(["e0", "e1", "e2"], dtype="|O"),
                        segset=np.array(["e0", "e1", "e2"], dtype="|O"),
                        stat0=np.ones((3, 1)), stat1=avg_x)
    ref_scores = fast_PLDA_scoring(pre, our_te, None, ref.mean, ref.F,
                                   ref.Sigma)
    np.testing.assert_allclose(dup.scoremat, ref_scores.scoremat,
                               rtol=1e-10, atol=1e-12)


def test_end_to_end_train_and_score_matches_reference():
    """Train both PLDAs on the same data AND score with each side's own
    (F, Sigma): the full pipeline agrees, not just shared-weights scoring."""
    ref_mod = _ref_plda_module()
    x, labels, segs, means = _dataset(seed=2)

    ref = ref_mod.PLDA(rank_f=3, nb_iter=10)
    ref.plda(_ref_statobject(ref_mod, x, labels, segs))
    ours = PLDA(rank_f=3, nb_iter=10)
    ours.plda(StatObject_SB(modelset=labels, segset=segs,
                            stat0=np.ones((len(x), 1)), stat1=x.copy()))

    (ref_en, ref_te, our_en, our_te,
     en_models, te_segs) = _enroll_test_sets(ref_mod, means)
    ref_scores = ref_mod.fast_PLDA_scoring(
        ref_en, ref_te, ref_mod.Ndx(models=en_models, testsegs=te_segs),
        ref.mean, ref.F, ref.Sigma)
    our_scores = our_en and fast_PLDA_scoring(
        our_en, our_te, None, ours.mean, ours.F, ours.Sigma)
    np.testing.assert_allclose(our_scores.scoremat, ref_scores.scoremat,
                               rtol=1e-6, atol=1e-8)
