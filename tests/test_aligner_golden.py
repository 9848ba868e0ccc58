"""Golden parity for the HMM aligner vs the reference
``speechbrain/alignment/aligner.py`` (torch CPU, imported with the stub
harness): forward/Viterbi scores + alignments on batched variable-length
inputs, lexicon pronunciation graphs (incl. the graph-overridden DP),
flat-start and Viterbi-training batches, state expansion, accuracy, and
collapse."""
import numpy as np
import pytest
import torch

from tests.conftest import import_reference_speechbrain, reference_available

from svt_speechbrain_tpu.alignment.aligner import HMMAligner

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference checkout not present")


def _ref_aligner(**kwargs):
    import_reference_speechbrain()
    from speechbrain.alignment.aligner import HMMAligner as RefAligner
    return RefAligner(**kwargs)


def _batch(seed=0, b=3, t=12, v=7, u=4):
    rng = np.random.default_rng(seed)
    emission = np.log(rng.dirichlet(np.ones(v), size=(b, t)))
    lens = np.array([1.0, 0.75, 0.5])[:b]
    phns = rng.integers(0, v, size=(b, u))
    phn_lens = np.array([1.0, 0.75, 0.5])[:b]
    return emission, lens, phns, phn_lens


@pytest.mark.parametrize("reduction,in_norm,tg_norm", [
    ("none", False, False), ("mean", True, False), ("sum", False, True)])
def test_forward_scores_match_reference(reduction, in_norm, tg_norm):
    emission, lens, phns, phn_lens = _batch()
    ref = _ref_aligner(batch_reduction=reduction, input_len_norm=in_norm,
                       target_len_norm=tg_norm)
    ours = HMMAligner(batch_reduction=reduction, input_len_norm=in_norm,
                      target_len_norm=tg_norm)
    ref_scores = ref(torch.tensor(emission).float(), torch.tensor(lens),
                     torch.tensor(phns), torch.tensor(phn_lens),
                     dp_algorithm="forward")
    our_scores = ours.forward(emission, lens, phns, phn_lens,
                              dp_algorithm="forward")
    np.testing.assert_allclose(np.atleast_1d(our_scores),
                               np.atleast_1d(ref_scores.numpy()),
                               rtol=1e-4, atol=1e-4)


def test_viterbi_scores_and_alignments_match_reference():
    emission, lens, phns, phn_lens = _batch(seed=1)
    ref = _ref_aligner()
    ours = HMMAligner()
    ref_scores, ref_align = ref(torch.tensor(emission).float(),
                                torch.tensor(lens), torch.tensor(phns),
                                torch.tensor(phn_lens),
                                dp_algorithm="viterbi")
    our_scores, our_align = ours.forward(emission, lens, phns, phn_lens,
                                         dp_algorithm="viterbi")
    assert our_align == ref_align
    np.testing.assert_allclose(our_scores, ref_scores.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_lexicon_graph_matches_reference():
    lexicon = {"a": {0: "a"}, "b": {0: "b", 1: "c"}}
    lab2ind = {"sil": 0, "a": 1, "b": 2, "c": 3}
    words = [["a", "b"]]

    ref = _ref_aligner()
    ref.lexicon = {k: dict(v) for k, v in lexicon.items()}
    ref.lex_lab2ind = dict(lab2ind)
    r_phns, r_lens, r_trans, r_pi, r_finals = ref.use_lexicon(words)

    ours = HMMAligner()
    ours.lexicon = {k: dict(v) for k, v in lexicon.items()}
    ours.lex_lab2ind = dict(lab2ind)
    o_phns, o_lens, o_trans, o_pi, o_finals = ours.use_lexicon(words)

    np.testing.assert_array_equal(o_phns, r_phns.numpy())
    np.testing.assert_allclose(o_lens, r_lens.numpy(), rtol=1e-6)
    np.testing.assert_allclose(o_trans, r_trans.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(o_pi, r_pi.numpy(), rtol=1e-5, atol=1e-5)
    assert o_finals == r_finals


def test_lexicon_viterbi_matches_reference():
    """Full lexicon-driven alignment: graph → overridden DP → same paths."""
    lexicon = {"a": {0: "a"}, "b": {0: "b", 1: "c"}}
    lab2ind = {"sil": 0, "a": 1, "b": 2, "c": 3}
    words = [["a", "b"]]

    ref = _ref_aligner()
    ref.lexicon = {k: dict(v) for k, v in lexicon.items()}
    ref.lex_lab2ind = dict(lab2ind)
    r_phns, r_lens, r_trans, r_pi, r_finals = ref.use_lexicon(words)

    ours = HMMAligner()
    ours.lexicon = {k: dict(v) for k, v in lexicon.items()}
    ours.lex_lab2ind = dict(lab2ind)
    o_phns, o_lens, o_trans, o_pi, o_finals = ours.use_lexicon(words)

    rng = np.random.default_rng(3)
    emission = np.log(rng.dirichlet(np.ones(4), size=(1, 10)))
    lens = np.array([1.0])

    ref_scores, ref_align = ref(
        torch.tensor(emission).float(), torch.tensor(lens), r_phns,
        r_lens, dp_algorithm="viterbi",
        prob_matrices={"pi_prob": r_pi, "trans_prob": r_trans,
                       "final_states": r_finals})
    our_scores, our_align = ours.forward(
        emission, lens, o_phns, o_lens, dp_algorithm="viterbi",
        prob_matrices={"pi_prob": o_pi, "trans_prob": o_trans,
                       "final_states": o_finals})
    assert our_align == ref_align


def test_training_loop_helpers_match_reference():
    emission, lens, phns, phn_lens = _batch(seed=2)
    ref = _ref_aligner()
    ours = HMMAligner()
    ids = [f"utt{i}" for i in range(len(lens))]

    # flat start (no stored alignments yet)
    r_flat = ref.get_prev_alignments(ids, torch.tensor(emission).float(),
                                     torch.tensor(lens), torch.tensor(phns),
                                     torch.tensor(phn_lens))
    o_flat = ours.get_prev_alignments(ids, emission, lens, phns, phn_lens)
    np.testing.assert_array_equal(o_flat, r_flat.numpy())

    # store then retrieve
    aligns = [[1, 1, 2], [3, 4, 4, 4], [2]]
    ref.store_alignments(ids, aligns)
    ours.store_alignments(ids, aligns)
    r_vit = ref.get_prev_alignments(ids, torch.tensor(emission).float(),
                                    torch.tensor(lens), torch.tensor(phns),
                                    torch.tensor(phn_lens))
    o_vit = ours.get_prev_alignments(ids, emission, lens, phns, phn_lens)
    np.testing.assert_array_equal(o_vit, r_vit.numpy())


def test_expand_accuracy_collapse_match_reference():
    ref = _ref_aligner(states_per_phoneme=3)
    ours = HMMAligner(states_per_phoneme=3)

    phns = np.array([[0., 3., 5., 0.], [0., 2., 0., 0.]])
    phn_lens = np.array([1., 0.75])
    r_exp = ref.expand_phns_by_states_per_phoneme(
        torch.tensor(phns), torch.tensor(phn_lens))
    o_exp = ours.expand_phns_by_states_per_phoneme(phns, phn_lens)
    np.testing.assert_array_equal(o_exp, r_exp.numpy())

    align = [0, 1, 2, 3, 4, 5, 3, 4, 5, 0, 1, 2]
    assert ours.collapse_alignments(align) == ref.collapse_alignments(align)

    ref1 = _ref_aligner()
    ours1 = HMMAligner()
    r_acc = ref1.calc_accuracy([[0., 0., 0., 1.]], [[2, 4]], [[0., 1.]])
    o_acc = ours1.calc_accuracy([[0., 0., 0., 1.]], [[2, 4]], [[0., 1.]])
    np.testing.assert_allclose(o_acc, r_acc.numpy())


LEXICON_FIXTURE = """\
;;; comment header line one
;;; comment header line two
read/r eh1 d/
read~1/r iy2 d/
a/ah0/
moon/m uw1 n/
"""


def test_lexicon_file_parse_matches_reference(tmp_path):
    """The CMU-style lexicon *file* parser: leading ``;`` comments skipped,
    ``~`` variants folded into the headword, stress digits stripped, and
    the sil-reserved label maps built identically."""
    path = tmp_path / "lexicon.txt"
    path.write_text(LEXICON_FIXTURE)
    ref = _ref_aligner(lexicon_path=str(path))
    ours = HMMAligner(lexicon_path=str(path))
    assert ours.lexicon == ref.lexicon
    assert ours.lex_lab2ind == ref.lex_lab2ind
    assert ours.lex_ind2lab == ref.lex_ind2lab
