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



def _logsumexp(a, axis):
    m = np.max(a, axis=axis, keepdims=True)
    m = np.where(np.isfinite(m), m, 0.0)
    with np.errstate(over="ignore"):
        return np.squeeze(m, axis) + np.log(np.sum(np.exp(a - m), axis=axis))


class CTCPrefixScorer:
    """CTC prefix scorer for joint CTC/attention beam decoding — the
    reference's exact Algorithm-2 implementation (``ctc.py:13``; Watanabe et
    al., TR2017-190), numerically golden-tested in
    ``tests/test_ctc_scorer_golden.py``: the (r, psi, scoring_table) state
    tuple, time pruning from the prefix length, partial candidate scoring
    with the scoring table, attention-window pruning, eos scored from each
    utterance's last frame, blank excluded from joint scores, and the
    vocab-flat ``permute_mem``. The per-row python loops of the reference
    are vectorized with fancy indexing; the math is unchanged.

    Arguments mirror the reference: ``x`` (B, T, V) LOG posteriors from the
    CTC head, ``enc_lens`` ABSOLUTE frame counts.
    """

    def __init__(self, x, enc_lens, batch_size, beam_size, blank_index,
                 eos_index, ctc_window_size=0):
        self.blank_index = blank_index
        self.eos_index = eos_index
        self.batch_size = batch_size
        self.beam_size = beam_size
        self.ctc_window_size = ctc_window_size
        self.minus_inf = -1e20

        x = np.array(x, dtype=np.float64, copy=True)
        self.max_enc_len = x.shape[1]
        self.vocab_size = x.shape[-1]
        enc_lens = np.asarray(enc_lens, np.int64)
        self.last_frame_index = enc_lens - 1

        # mask frames past each utterance's length: all-minus-inf except a
        # free blank (reference :58-62)
        mask = np.arange(self.max_enc_len)[None, :] >= enc_lens[:, None]
        x = np.where(mask[:, :, None], self.minus_inf, x)
        x[:, :, 0] = np.where(mask, 0.0, x[:, :, 0])

        xnb = x.transpose(1, 0, 2)                        # (T, B, V)
        xb = np.broadcast_to(xnb[:, :, self.blank_index][:, :, None],
                             xnb.shape)
        self.x = np.stack([xnb, np.array(xb)])            # (2, T, B, V)
        self.beam_offset = np.arange(batch_size) * beam_size
        self.cand_offset = np.arange(batch_size) * self.vocab_size

    def forward_step(self, g, state, candidates=None, attn=None):
        """Score extending each prefix ``g`` (B·beam, prefix_len) by every
        vocab token (or only ``candidates``); returns (psi - psi_prev,
        new state)."""
        g = np.asarray(g)
        n_bh = self.batch_size * self.beam_size
        prefix_length = g.shape[1] if g.ndim == 2 else 0
        if prefix_length > 0:
            last_char = np.asarray(g[:, -1], np.int64)
        else:
            last_char = np.zeros(n_bh, np.int64)
        self.num_candidates = (self.vocab_size if candidates is None
                               else candidates.shape[-1])
        if state is None:
            # empty-prefix forward variables: all-blank paths
            r_prev = np.full((self.max_enc_len, 2, self.batch_size,
                              self.beam_size), self.minus_inf)
            r_prev[:, 1] = np.cumsum(
                self.x[0, :, :, self.blank_index], 0)[:, :, None]
            r_prev = r_prev.reshape(-1, 2, n_bh)
            psi_prev = 0.0
        else:
            r_prev, psi_prev = state

        if candidates is not None:
            candidates = np.asarray(candidates, np.int64)
            scoring_table = np.full((n_bh, self.vocab_size), -1, np.int64)
            scoring_table[np.arange(n_bh)[:, None],
                          candidates] = np.arange(self.num_candidates)
            scoring_index = (
                candidates
                + np.repeat(self.cand_offset, self.beam_size)[:, None]
            ).reshape(-1)
            x_inflate = self.x.reshape(2, -1, self.batch_size
                                       * self.vocab_size)[
                :, :, scoring_index].reshape(
                2, -1, n_bh, self.num_candidates)
        else:
            scoring_table = None
            x_inflate = np.repeat(self.x, self.beam_size, axis=2)

        r = np.full((self.max_enc_len, 2, n_bh, self.num_candidates),
                    self.minus_inf)
        if prefix_length == 0:
            r[0, 0] = x_inflate[0, 0]
        r_sum = _logsumexp(r_prev, axis=1)                 # (T, n_bh)
        phi = np.repeat(r_sum[:, :, None], self.num_candidates, axis=2)
        # phi(last char of g) = r^b_prev (reference :180-186)
        if candidates is not None:
            pos = scoring_table[np.arange(n_bh), last_char]
            sel = pos != -1
            phi[:, np.flatnonzero(sel), pos[sel]] = r_prev[:, 1][:, sel]
        else:
            phi[:, np.arange(n_bh), last_char] = r_prev[:, 1]

        # scoring frames: |g| < |h|, optional attention window (ref :190)
        if self.ctc_window_size == 0 or attn is None:
            start = max(1, prefix_length)
            end = self.max_enc_len
        else:
            attn_peak = np.argmax(np.asarray(attn), axis=1)
            max_frame = int(np.max(attn_peak)) + self.ctc_window_size
            min_frame = int(np.min(attn_peak)) - self.ctc_window_size
            start = max(max(1, prefix_length), min_frame)
            end = min(self.max_enc_len, max_frame)

        for t in range(start, end):
            rnb_prev = r[t - 1, 0]
            rb_prev = r[t - 1, 1]
            r[t, 0] = np.logaddexp(rnb_prev, phi[t - 1]) + x_inflate[0, t]
            r[t, 1] = np.logaddexp(rnb_prev, rb_prev) + x_inflate[1, t]

        psi_init = r[start - 1, 0][None]
        phix = np.concatenate((phi[0][None], phi[:-1]), axis=0) + x_inflate[0]
        if candidates is not None:
            psi = np.full((n_bh, self.vocab_size), self.minus_inf)
            psi_ = _logsumexp(
                np.concatenate((phix[start:end], psi_init), axis=0), axis=0)
            psi[np.arange(n_bh)[:, None], candidates] = psi_
        else:
            psi = _logsumexp(
                np.concatenate((phix[start:end], psi_init), axis=0), axis=0)

        # eos scores from each utterance's LAST VALID frame (ref :232)
        rows = np.arange(n_bh)
        psi[:, self.eos_index] = r_sum[
            self.last_frame_index[rows // self.beam_size], rows]
        # blank never proposed by the joint decoder (ref :238)
        psi[:, self.blank_index] = self.minus_inf

        return psi - psi_prev, (r, psi, scoring_table)

    def permute_mem(self, memory, index):
        """Synchronize the scorer state with the search's top-k choice
        (reference ``:242``). ``index``: (B, beam) candidate indices in the
        beam·vocab-flattened space."""
        r, psi, scoring_table = memory
        index = np.asarray(index, np.int64)
        best_index = (index + (self.beam_offset[:, None]
                               * self.vocab_size)).reshape(-1)
        psi = psi.reshape(-1)[best_index]
        psi = np.broadcast_to(
            psi[:, None], (self.batch_size * self.beam_size,
                           self.vocab_size)).copy()
        if scoring_table is not None:
            effective_index = (index // self.vocab_size
                               + self.beam_offset[:, None]).reshape(-1)
            selected_vocab = (index % self.vocab_size).reshape(-1)
            score_index = scoring_table[effective_index, selected_vocab]
            score_index[score_index == -1] = 0
            best_index = score_index + effective_index * self.num_candidates
        r = r.reshape(-1, 2, self.batch_size * self.beam_size
                      * self.num_candidates)[:, :, best_index]
        return r, psi
