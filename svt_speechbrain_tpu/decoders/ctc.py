"""CTC decoding (analogue of reference ``speechbrain/decoders/ctc.py``)."""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def filter_ctc_output(string_pred, blank_id=-1):
    """Merge repeats then drop blanks (reference ``ctc.py:341``).

    Example
    -------
    >>> filter_ctc_output([0, 0, 3, 3, 0, 1, 1], blank_id=0)
    [3, 1]
    """
    if isinstance(string_pred, list):
        out = [v for i, v in enumerate(string_pred)
               if i == 0 or v != string_pred[i - 1]]
        return [v for v in out if v != blank_id]
    raise ValueError("filter_ctc_output expects a list")


def ctc_greedy_decode(probabilities, seq_lens, blank_id=-1):
    """Batch greedy CTC decode (reference ``ctc.py:372``): argmax per frame,
    trim padding by relative lengths, collapse repeats, drop blanks.

    Example
    -------
    >>> import numpy as np
    >>> probs = np.zeros((1, 4, 3))
    >>> probs[0, [0, 1, 2, 3], [1, 1, 0, 2]] = 1.0   # 1 1 blank(0) 2
    >>> ctc_greedy_decode(probs, [1.0], blank_id=0)
    [[1, 2]]
    """
    probabilities = np.asarray(probabilities)
    if blank_id < 0:
        blank_id = probabilities.shape[-1] + blank_id
    batch_max_len = probabilities.shape[1]
    argmaxes = probabilities.argmax(-1)
    outputs = []
    for seq, seq_len in zip(argmaxes, np.asarray(seq_lens)):
        actual_size = int(round(float(seq_len) * batch_max_len))
        outputs.append(filter_ctc_output(seq[:actual_size].tolist(), blank_id=blank_id))
    return outputs


class CTCPrefixScorer:
    """CTC prefix scoring for joint CTC/attention beam decoding
    (reference ``ctc.py:13``; Watanabe et al. hybrid decoding).

    The per-step interface mirrors the reference: ``forward_step(g, state)``
    returns scores for extending each hypothesis prefix by every vocab token,
    using the standard ψ recursion over blank/non-blank forward variables.
    """

    def __init__(self, x, enc_lens, batch_size, beam_size, blank_index, eos_index,
                 ctc_window_size=0):
        self.blank_index = blank_index
        self.eos_index = eos_index
        self.batch_size = batch_size
        self.beam_size = beam_size
        self.vocab_size = x.shape[-1]
        self.max_enc_len = x.shape[1]

        # log-softmax CTC posteriors (B, T, V) → expanded to beams later
        self.x = jax.nn.log_softmax(jnp.asarray(x), axis=-1)
        t = self.max_enc_len
        abs_len = jnp.round(jnp.asarray(enc_lens) * t).astype(jnp.int32)
        self.mask = (jnp.arange(t)[None, :] < abs_len[:, None])  # (B, T)
        self.minus_inf = -1e20

    def init_state(self):
        """(r_prev, psi_prev) for empty prefixes."""
        bsz = self.batch_size * self.beam_size
        x = jnp.repeat(self.x, self.beam_size, axis=0)  # (B*beam, T, V)
        mask = jnp.repeat(self.mask, self.beam_size, axis=0)
        # r_nb over time for the empty prefix: cumulative blank prob
        blank_lp = jnp.where(mask, x[:, :, self.blank_index], 0.0)
        r_b = jnp.cumsum(blank_lp, axis=1)  # log prob of all-blank prefix
        r_nb = jnp.full_like(r_b, self.minus_inf)
        return {"x": x, "mask": mask, "r_b": r_b, "r_nb": r_nb,
                "psi": jnp.zeros((bsz,))}

    def forward_step(self, inp_tokens, states, candidates=None, attn=None):
        """Score extending each prefix with every vocab token.

        For efficiency this implements the recursion for all tokens at once:
        r_nb_new(t, c) = lp(t, c) + logaddexp(r_nb_prev(t-1) [c == last? φ],
        r_b_prev(t-1)); returns ψ(c) - ψ_prev.
        """
        x, mask = states["x"], states["mask"]
        bsz, t_max, v = x.shape
        r_b_prev, r_nb_prev = states["r_b"], states["r_nb"]
        last = inp_tokens  # (bsz,) last token of each prefix

        # phi(t) = r_b_prev(t) for the repeated-last-token case else
        # logaddexp(r_b_prev, r_nb_prev)
        r_sum = jnp.logaddexp(r_b_prev, r_nb_prev)  # (bsz, T)
        phi = r_sum[:, :, None].repeat(v, axis=2)
        phi = phi.at[jnp.arange(bsz), :, last].set(r_b_prev)

        lp = x  # (bsz, T, V)

        def scan_step(carry, t):
            r_nb_t_prev, r_b_t_prev, psi = carry
            # r_nb(t, c) = lp(t, c) + logaddexp(r_nb(t-1, c), phi(t-1, c))
            start = jnp.logaddexp(r_nb_t_prev, phi[:, t - 1])
            r_nb_t = lp[:, t] + start
            # r_b(t) = blank(t) + logaddexp(r_b(t-1), r_nb(t-1)) — per new prefix c
            r_b_t = lp[:, t, self.blank_index][:, None] + jnp.logaddexp(
                r_b_t_prev, r_nb_t_prev)
            psi = jnp.logaddexp(psi, phi[:, t - 1] + lp[:, t])
            valid = mask[:, t][:, None]
            r_nb_t = jnp.where(valid, r_nb_t, r_nb_t_prev)
            r_b_t = jnp.where(valid, r_b_t, r_b_t_prev)
            return (r_nb_t, r_b_t, psi), (r_nb_t, r_b_t)

        r_nb_0 = lp[:, 0] + jnp.where(
            jnp.arange(v)[None, :] == self.blank_index, self.minus_inf, 0.0)
        r_nb_0 = jnp.where(mask[:, 0][:, None], r_nb_0, self.minus_inf)
        r_b_0 = jnp.full((bsz, v), self.minus_inf)
        psi0 = r_nb_0
        (r_nb_T, r_b_T, psi), (r_nb_seq, r_b_seq) = jax.lax.scan(
            scan_step, (r_nb_0, r_b_0, psi0), jnp.arange(1, t_max))

        psi = jnp.where(jnp.arange(v)[None, :] == self.eos_index,
                        r_sum[:, -1][:, None], psi)
        scores = psi - states["psi"][:, None]
        new_states = {"x": x, "mask": mask, "psi": psi,
                      "r_nb_seq": r_nb_seq, "r_b_seq": r_b_seq,
                      "r_nb_0": r_nb_0, "r_b_0": r_b_0}
        return scores, new_states

    def permute_mem(self, states, index):
        """Select per-candidate forward variables after top-k
        (reference ``ctc.py:269``). ``index``: (bsz,) chosen token per beam
        plus (bsz,) beam reordering."""
        beam_idx, tok_idx = index
        r_nb_seq = states["r_nb_seq"]  # (T-1, bsz, V)
        r_b_seq = states["r_b_seq"]
        t1 = r_nb_seq.shape[0]
        bsz = beam_idx.shape[0]
        r_nb = jnp.concatenate([states["r_nb_0"][None], r_nb_seq], axis=0)
        r_b = jnp.concatenate([states["r_b_0"][None], r_b_seq], axis=0)
        r_nb_sel = r_nb[:, beam_idx, tok_idx].transpose(1, 0)  # (bsz, T)
        r_b_sel = r_b[:, beam_idx, tok_idx].transpose(1, 0)
        return {"x": states["x"], "mask": states["mask"],
                "r_b": r_b_sel, "r_nb": r_nb_sel,
                "psi": states["psi"][beam_idx, tok_idx]}
