"""Golden parity for the CTC prefix scorer vs the reference
``speechbrain/decoders/ctc.py`` ``CTCPrefixScorer``: full and partial
(candidate-pruned) scoring, attention-window pruning, multi-step
score/permute chains with variable encoder lengths."""
import numpy as np
import pytest
import torch

from tests.conftest import import_reference_speechbrain, reference_available

from svt_speechbrain_tpu.decoders.ctc import CTCPrefixScorer

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference checkout not present")

B, BEAM, T, V = 2, 3, 8, 6
BLANK, EOS = 0, 5


def _pair(ctc_window_size=0, seed=0):
    import_reference_speechbrain()
    from speechbrain.decoders.ctc import CTCPrefixScorer as RScorer

    rng = np.random.default_rng(seed)
    x = torch.log_softmax(
        torch.tensor(rng.normal(size=(B, T, V)).astype(np.float32)), -1)
    enc_lens = torch.tensor([T, T - 2])
    ref = RScorer(x.clone(), enc_lens.clone(), B, BEAM, BLANK, EOS,
                  ctc_window_size)
    ours = CTCPrefixScorer(np.asarray(x), np.asarray(enc_lens), B, BEAM,
                           BLANK, EOS, ctc_window_size)
    return ref, ours


def _rand_candidates(rng, k):
    return np.stack([rng.permutation(V)[:k] for _ in range(B * BEAM)])


@pytest.mark.parametrize("partial", [False, True])
def test_multistep_score_and_permute_chain(partial):
    ref, ours = _pair()
    rng = np.random.default_rng(3)

    g = np.zeros((B * BEAM, 0), np.int64)
    r_state = o_state = None
    for step in range(4):
        cands = _rand_candidates(rng, 4) if partial else None
        r_psi, r_state = ref.forward_step(
            torch.tensor(g), r_state,
            None if cands is None else torch.tensor(cands), None)
        o_psi, o_state = ours.forward_step(g, o_state, cands, None)
        np.testing.assert_allclose(np.asarray(o_psi), r_psi.numpy(),
                                   atol=1e-4)
        idx = rng.integers(0, BEAM * V, size=(B, BEAM))
        r_state = ref.permute_mem(r_state, torch.tensor(idx))
        o_state = ours.permute_mem(o_state, idx)
        tok = (idx % V).reshape(-1, 1)
        g = np.concatenate([g, tok], axis=1)


def test_attention_window_matches_reference():
    ref, ours = _pair(ctc_window_size=2)
    rng = np.random.default_rng(5)
    g = rng.integers(1, V, size=(B * BEAM, 2))
    attn = rng.random((B * BEAM, T)).astype(np.float32)
    r_psi, _ = ref.forward_step(torch.tensor(g), None, None,
                                torch.tensor(attn))
    o_psi, _ = ours.forward_step(g, None, None, attn)
    np.testing.assert_allclose(np.asarray(o_psi), r_psi.numpy(), atol=1e-4)


def test_eos_and_blank_semantics():
    ref, ours = _pair()
    g = np.asarray([[1], [2], [3], [2], [1], [4]])
    r_psi, _ = ref.forward_step(torch.tensor(g), None, None, None)
    o_psi, _ = ours.forward_step(g, None, None, None)
    # blank never proposed; eos scored from each utterance's last frame
    assert np.all(np.asarray(o_psi)[:, BLANK] <= -1e19)
    np.testing.assert_allclose(np.asarray(o_psi)[:, EOS],
                               r_psi.numpy()[:, EOS], atol=1e-4)
