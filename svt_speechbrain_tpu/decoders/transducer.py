"""Transducer decoding (analogue of reference
``speechbrain/decoders/transducer.py``)."""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


class TransducerBeamSearcher:
    """Greedy (beam=1) and beam transducer search (reference
    ``transducer.py:10``).

    ``decode_fn(tokens, state) → (dec_out, state)`` runs the prediction
    network one step; ``joint_fn(enc_frame, dec_out) → logits`` the joint.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> V = 4   # vocab with blank_id=0
    >>> def decode_fn(tokens, state):      # suppress the last-emitted token
    ...     return -10.0 * jax.nn.one_hot(tokens, V), None
    >>> def joint_fn(enc_frame, dec_out):
    ...     return enc_frame + dec_out
    >>> enc = 5.0 * jax.nn.one_hot(jnp.array([[2, 1, 0]]), V)  # (1, 3, V)
    >>> searcher = TransducerBeamSearcher(decode_fn, joint_fn, blank_id=0,
    ...                                   beam_size=1)
    >>> hyps, scores = searcher(enc)
    >>> hyps
    [[2, 1]]
    >>> TransducerBeamSearcher(decode_fn, joint_fn, blank_id=0,
    ...                        beam_size=2)(enc)[0]
    [[2, 1]]
    """

    def __init__(self, decode_fn, joint_fn, blank_id, beam_size=4,
                 nbest=1, lm_module=None, lm_weight=0.0,
                 state_beam=2.3, expand_beam=2.3):
        self.decode_fn = decode_fn
        self.joint_fn = joint_fn
        self.blank_id = blank_id
        self.beam_size = beam_size
        self.nbest = nbest
        self.state_beam = state_beam
        self.expand_beam = expand_beam

    def __call__(self, encoder_out):
        if self.beam_size == 1:
            return self.transducer_greedy_decode(encoder_out)
        return self.transducer_beam_search_decode(encoder_out)

    def transducer_greedy_decode(self, encoder_out):
        """Per-frame greedy: emit while the joint prefers a label
        (reference ``transducer.py:133``)."""
        batch = encoder_out.shape[0]
        hyps = [[] for _ in range(batch)]
        tokens = jnp.full((batch,), self.blank_id, jnp.int32)
        dec_out, state = self.decode_fn(tokens, None)
        for t in range(encoder_out.shape[1]):
            max_emit = 10  # safety bound on symbols per frame
            for _ in range(max_emit):
                logits = self.joint_fn(encoder_out[:, t], dec_out)
                pred = np.asarray(jnp.argmax(logits, axis=-1))
                nonblank = pred != self.blank_id
                if not nonblank.any():
                    break
                for b in np.flatnonzero(nonblank):
                    hyps[b].append(int(pred[b]))
                new_tokens = jnp.where(jnp.asarray(nonblank), jnp.asarray(pred), tokens)
                new_dec, new_state = self.decode_fn(new_tokens.astype(jnp.int32), state)
                mask = jnp.asarray(nonblank)[:, None]
                dec_out = jnp.where(mask, new_dec, dec_out)
                state = jax.tree_util.tree_map(
                    lambda n, o: jnp.where(
                        mask.reshape((-1,) + (1,) * (n.ndim - 1)), n, o),
                    new_state, state) if state is not None else new_state
        scores = [0.0] * batch
        return hyps, scores

    def transducer_beam_search_decode(self, encoder_out):
        """Beam search per utterance (reference ``transducer.py:219``)."""
        results, scores_out = [], []
        for b in range(encoder_out.shape[0]):
            enc = encoder_out[b]
            hyp = {"prediction": [self.blank_id], "logp_score": 0.0, "state": None,
                   "dec_out": None}
            tokens = jnp.asarray([self.blank_id], jnp.int32)
            dec_out, state = self.decode_fn(tokens, None)
            hyp["dec_out"], hyp["state"] = dec_out, state
            beam_hyps = [hyp]
            for t in range(enc.shape[0]):
                process_hyps = beam_hyps
                beam_hyps = []
                while len(beam_hyps) < self.beam_size:
                    a_best = max(process_hyps, key=lambda h: h["logp_score"] / max(len(h["prediction"]), 1))
                    process_hyps.remove(a_best)
                    if beam_hyps:
                        b_best = max(beam_hyps, key=lambda h: h["logp_score"] / max(len(h["prediction"]), 1))
                        a_score = a_best["logp_score"] / max(len(a_best["prediction"]), 1)
                        b_score = b_best["logp_score"] / max(len(b_best["prediction"]), 1)
                        if b_score >= self.state_beam + a_score:
                            break
                    logits = self.joint_fn(enc[t][None], a_best["dec_out"])
                    log_probs = np.asarray(jax.nn.log_softmax(logits, axis=-1))[0]
                    best_logp = np.partition(log_probs, -1)[-1]
                    for tok in np.argsort(-log_probs)[: self.beam_size]:
                        logp = float(log_probs[tok])
                        new_hyp = {
                            "prediction": list(a_best["prediction"]),
                            "logp_score": a_best["logp_score"] + logp,
                            "state": a_best["state"],
                            "dec_out": a_best["dec_out"],
                        }
                        if tok == self.blank_id:
                            beam_hyps.append(new_hyp)
                            continue
                        if logp >= best_logp - self.expand_beam:
                            new_hyp["prediction"].append(int(tok))
                            d_out, d_state = self.decode_fn(
                                jnp.asarray([tok], jnp.int32), a_best["state"])
                            new_hyp["dec_out"] = d_out
                            new_hyp["state"] = d_state
                            process_hyps.append(new_hyp)
                    if not process_hyps:
                        break
            ranked = sorted(beam_hyps,
                            key=lambda h: h["logp_score"] / max(len(h["prediction"]), 1),
                            reverse=True)[: self.nbest]
            results.append(ranked[0]["prediction"][1:])
            scores_out.append(ranked[0]["logp_score"] / max(len(ranked[0]["prediction"]), 1))
        return results, scores_out
