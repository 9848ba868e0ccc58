"""Golden parity for the transducer searcher vs the reference
``speechbrain/decoders/transducer.py``: greedy (one-symbol-per-frame,
batched PN updates) and beam search (state/expand-beam pruning, normalized
ranking), with and without LM shallow fusion, under a shared deterministic
prediction network + joint."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.conftest import import_reference_speechbrain, reference_available

from svt_speechbrain_tpu.decoders.transducer import TransducerBeamSearcher

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference checkout not present")

V, H = 6, 5   # vocab (blank=0), joint hidden
BLANK = 0


def _tables(seed):
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(V, H)).astype(np.float32)       # PN "embedding"
    # classifier with a constant blank bias: when blank rarely reaches the
    # top-k the reference's own expansion loop never terminates
    w_joint = (0.7 * rng.normal(size=(H, V))).astype(np.float32)
    b_joint = np.zeros(V, np.float32)
    b_joint[BLANK] = 2.5
    enc = rng.normal(size=(2, 7, H)).astype(np.float32)    # TN output
    lm_table = np.log(rng.dirichlet(np.ones(V), size=V)).astype(np.float32)
    return emb, (w_joint, b_joint), enc, lm_table


def _ref_searcher(emb, w_joint, lm_table, **kwargs):
    import_reference_speechbrain()
    from speechbrain.decoders.transducer import (TransducerBeamSearcher
                                                 as RefSearcher)

    class GRU(torch.nn.Module):
        # class NAME matters: the reference's _forward_PN dispatches the
        # hidden-state path on layer.__class__.__name__
        def forward(self, x, hx=None):
            b = x.shape[0]
            h = hx if hx is not None else torch.zeros(1, b, H)
            e = torch.tensor(emb)[x.long().reshape(-1)].reshape(b, 1, H)
            h_new = torch.tanh(0.5 * h + e.transpose(0, 1))
            return h_new.transpose(0, 1), h_new

    class TJoint(torch.nn.Module):
        def forward(self, tn, pn):
            return tn + pn                                  # (B,T,U,H)

    class Head(torch.nn.Module):
        def forward(self, x):
            w, b = w_joint
            return x @ torch.tensor(w) + torch.tensor(b)

    class LM(torch.nn.Module):
        def forward(self, x, hx=None):
            logits = torch.tensor(lm_table)[x.long().reshape(-1)].reshape(
                x.shape[0], 1, V)
            return logits, hx

    return RefSearcher(decode_network_lst=[GRU()], tjoint=TJoint(),
                       classifier_network=[Head()], blank_id=BLANK,
                       lm_module=LM(), **kwargs)


def _my_searcher(emb, w_joint, lm_table, **kwargs):
    def decode_fn(tokens, state):
        toks = np.asarray(tokens).reshape(-1)
        h = state if state is not None else jnp.zeros((len(toks), H))
        e = jnp.asarray(emb)[toks]
        h_new = jnp.tanh(0.5 * h + e)
        return h_new, h_new

    def joint_fn(enc_frame, dec_out):
        w, b = w_joint
        return ((jnp.asarray(enc_frame) + dec_out) @ jnp.asarray(w)
                + jnp.asarray(b))

    def lm_fn(tokens, state):
        return jnp.asarray(lm_table)[np.asarray(tokens).reshape(-1)], state

    kwargs.pop("lm_weight_ref", None)
    return TransducerBeamSearcher(decode_fn, joint_fn, blank_id=BLANK,
                                  lm_fn=lm_fn, **kwargs)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_greedy_matches_reference(seed):
    emb, w_joint, enc, lm_table = _tables(seed)
    ref = _ref_searcher(emb, w_joint, lm_table, beam_size=1)
    mine = _my_searcher(emb, w_joint, lm_table, beam_size=1)
    with torch.no_grad():
        r_hyps, r_score, _, _ = ref(torch.tensor(enc))
    o_hyps, o_score, _, _ = mine(jnp.asarray(enc))
    assert o_hyps == r_hyps
    assert np.isclose(o_score, float(r_score), rtol=1e-4)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("beam,lm_weight", [(3, 0.0), (4, 0.0), (3, 0.3)])
def test_beam_matches_reference(seed, beam, lm_weight):
    emb, w_joint, enc, lm_table = _tables(seed)
    ref = _ref_searcher(emb, w_joint, lm_table, beam_size=beam, nbest=3,
                        lm_weight=lm_weight)
    mine = _my_searcher(emb, w_joint, lm_table, beam_size=beam, nbest=3,
                        lm_weight=lm_weight)
    with torch.no_grad():
        r_best, r_score, r_nbest, r_nbest_scores = ref(torch.tensor(enc))
    o_best, o_score, o_nbest, o_nbest_scores = mine(jnp.asarray(enc))
    assert o_best == r_best
    assert o_nbest == r_nbest
    for ob, rb in zip(o_nbest_scores, r_nbest_scores):
        np.testing.assert_allclose(
            np.asarray(ob, np.float64),
            np.asarray([float(x) for x in rb], np.float64), rtol=1e-4)
    assert np.isclose(o_score, float(r_score), rtol=1e-4)
