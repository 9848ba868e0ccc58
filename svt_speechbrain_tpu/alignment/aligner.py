"""HMM forced alignment (analogue of reference
``speechbrain/alignment/aligner.py`` ``HMMAligner``).

Left-to-right HMM over the phoneme sequence with self-loops and forward
transitions. The full reference surface is implemented with the reference's
numerics (``tests/test_aligner_golden.py`` golden-tests forward/Viterbi
scores, alignments, lexicon graphs, flat-start/Viterbi-training batches,
and accuracy): masked per-frame emission gathers, the exact pi/transition
log-softmax construction, the forward DP that freezes finished rows via a
self-loop identity, Viterbi backtrace from the chosen final state, lexicon
pronunciation graphs with optional inter-word silences, and the
flat-start → store → retrieve Viterbi-training loop. Host-side numpy —
alignment DP over (U, T) grids is small next to the acoustic model; the
log-space mat-vec primitives also exist as jax ops for device use.
"""
from __future__ import annotations

import collections
import itertools
import pickle
import random

import numpy as np

import jax

from svt_speechbrain_tpu.utils.checkpoints import (mark_as_loader,
                                                   mark_as_saver,
                                                   register_checkpoint_hooks)


def _log_softmax(x, axis):
    m = np.max(x, axis=axis, keepdims=True)
    m = np.where(np.isfinite(m), m, 0.0)
    z = x - m
    with np.errstate(over="ignore", divide="ignore"):
        # all -inf rows (padded states) produce -inf lse -> nan rows, which
        # callers overwrite with neg_inf like the reference
        lse = np.log(np.sum(np.exp(z), axis=axis, keepdims=True))
    return z - lse


@register_checkpoint_hooks
class HMMAligner:
    """Viterbi/forward alignment over batched emission posteriors
    (reference ``aligner.py:17``). See ``forward`` for the main entry.

    Example
    -------
    >>> import numpy as np
    >>> emission = np.full((1, 9, 5), -10.0)
    >>> truth = [0, 0, 0, 1, 1, 1, 2, 2, 2]
    >>> phn_ids = [3, 1, 4]
    >>> for t, seg in enumerate(truth):
    ...     emission[0, t, phn_ids[seg]] = 0.0
    >>> aligner = HMMAligner()
    >>> scores, alignments = aligner.forward(
    ...     emission, np.array([1.0]), np.array([phn_ids]), np.array([1.0]),
    ...     dp_algorithm="viterbi")
    >>> alignments
    [[3, 3, 3, 1, 1, 1, 4, 4, 4]]
    >>> forward_scores = aligner.forward(
    ...     emission, np.array([1.0]), np.array([phn_ids]), np.array([1.0]),
    ...     dp_algorithm="forward")
    >>> bool(forward_scores[0] >= scores[0])   # sum over paths >= best path
    True
    """

    def __init__(self, states_per_phoneme=1, output_folder="", neg_inf=-1e5,
                 batch_reduction="none", input_len_norm=False,
                 target_len_norm=False, lexicon_path=None):
        self.states_per_phoneme = states_per_phoneme
        self.output_folder = output_folder
        self.neg_inf = neg_inf
        self.batch_reduction = batch_reduction
        self.input_len_norm = input_len_norm
        self.target_len_norm = target_len_norm
        self.align_dict = {}
        self.lexicon_path = lexicon_path
        if lexicon_path is not None:
            self._load_lexicon(lexicon_path)

    # ------------------------------------------------------------- lexicon

    def _load_lexicon(self, lexicon_path):
        """Parse a CMU-style lexicon file: ``word/phones/`` lines, a leading
        block of ``;`` comments, ``~``-suffixed pronunciation variants keyed
        back to the headword, stress digits stripped from phones
        (reference ``aligner.py:98-136``)."""
        with open(lexicon_path) as f:
            entries = itertools.dropwhile(
                lambda ln: ln[:1] == ";", f.read().splitlines())
        pronunciations = collections.defaultdict(list)
        inventory = set()
        for entry in entries:
            headword = entry.split()[0].partition("~")[0]
            phones = "".join(c for c in entry.split("/")[1] if not c.isdigit())
            inventory.update(phones.split(" "))
            pronunciations[headword].append(phones)
        self.lexicon = {w: dict(enumerate(ps))
                        for w, ps in pronunciations.items()}
        ranked = sorted(inventory)
        self.lex_lab2ind = {p: i for i, p in enumerate(ranked, start=1)}
        self.lex_ind2lab = {i: p for i, p in enumerate(ranked, start=1)}
        # "sil" is reserved index 0; it never appears in lexicon files.
        self.lex_lab2ind["sil"] = 0
        self.lex_ind2lab[0] = "sil"

    def _use_lexicon(self, words, interword_sils, sample_pron):
        """One utterance's pronunciation graph (reference ``aligner.py:138``):
        optional silences, all (or one sampled) pronunciation(s) per word,
        self-loops + within-pronunciation chains + word→word links, row
        log-softmax. Returns (poss_phns, log_trans, start_states,
        final_states)."""
        spp = self.states_per_phoneme
        state_phn = []   # per-state (phoneme_label * spp + offset), alloc order

        def alloc(label):
            """Allocate ``spp`` consecutive HMM states for one phoneme."""
            base = len(state_phn)
            state_phn.extend(label * spp + k for k in range(spp))
            return list(range(base, base + spp))

        def pron_chain(phones):
            return [s for p in phones.split()
                    for s in alloc(self.lex_lab2ind[p])]

        # Segment list: leading silence, each word's pronunciation chains,
        # inter-word silences when requested, always a trailing silence.
        segments = [([alloc(self.silence_index)], True)]
        for word in words:
            prons = self.lexicon[word]
            if sample_pron and len(prons) > 1:
                random.shuffle(prons)  # int-keyed dict: in-place value swap
            take = 1 if sample_pron else len(prons)
            segments.append(
                ([pron_chain(prons[k]) for k in range(take)], False))
            if interword_sils:
                segments.append(([alloc(self.silence_index)], True))
        if not interword_sils:
            segments.append(([alloc(self.silence_index)], True))

        # Self-loops on the diagonal, forward links within each chain,
        # word→word links that make every silence optional, plus the
        # word→silence path; the last word and the trailing silence are
        # the accepting states.
        trans = np.eye(len(state_phn))
        final_states = []
        for i, (chains, is_sil) in enumerate(segments):
            for chain in chains:
                trans[chain[:-1], chain[1:]] = 1.0
            lasts = [chain[-1] for chain in chains]
            if i < len(segments) - 2:
                fwd = i + 1 if is_sil or not interword_sils else i + 2
                starts = [chain[0] for chain in segments[fwd][0]]
                trans[np.ix_(lasts, starts)] = 1.0
            else:
                final_states += lasts
            if not is_sil:
                trans[lasts, segments[i + 1][0][0][0]] = 1.0

        with np.errstate(divide="ignore"):
            log_transition_matrix = _log_softmax(np.log(trans), axis=1)
        start_states = ([segments[0][0][0][0]]
                        + [chain[0] for chain in segments[1][0]])
        return (np.asarray(state_phn), log_transition_matrix,
                start_states, final_states)

    def use_lexicon(self, words, interword_sils=True, sample_pron=False):
        """Batch of pronunciation graphs (reference ``aligner.py:294``):
        returns (poss_phns (B, U), poss_phn_lens relative, trans_prob
        (B, U, U), pi_prob (B, U), final_states per utterance)."""
        self.silence_index = self.lex_lab2ind["sil"]
        poss_phns, trans_prob, start_states, final_states = [], [], [], []
        for words_ in words:
            p, t, s, f = self._use_lexicon(words_, interword_sils, sample_pron)
            poss_phns.append(p)
            trans_prob.append(t)
            start_states.append(s)
            final_states.append(f)

        poss_phn_lens = [len(p) for p in poss_phns]
        u_max = max(poss_phn_lens)
        batch_size = len(poss_phns)
        for i in range(batch_size):
            pad = u_max - len(poss_phns[i])
            poss_phns[i] = np.pad(poss_phns[i], (0, pad))
            trans_prob[i] = np.pad(trans_prob[i], ((0, pad), (0, pad)),
                                   constant_values=self.neg_inf)
        poss_phns = np.stack(poss_phns)
        trans_prob = np.stack(trans_prob)
        trans_prob[trans_prob == -np.inf] = self.neg_inf

        pi_prob = self.neg_inf * np.ones([batch_size, u_max])
        # mirror the reference: every utterance's start states mark ALL rows
        for start_state in start_states:
            pi_prob[:, start_state] = 1
        pi_prob = _log_softmax(pi_prob, axis=1)
        poss_phn_lens = np.asarray(poss_phn_lens, np.float64) / u_max
        return poss_phns, poss_phn_lens, trans_prob, pi_prob, final_states

    # -------------------------------------------------------- prob tensors

    def _make_pi_prob(self, phn_lens_abs):
        """All initial mass on the first phoneme (reference ``:451``)."""
        batch_size = len(phn_lens_abs)
        u_max = int(np.max(phn_lens_abs))
        pi_prob = self.neg_inf * np.ones([batch_size, u_max])
        pi_prob[:, 0] = 0
        return pi_prob

    def _make_trans_prob(self, phn_lens_abs):
        """Self-loop + next-phoneme transitions, length-masked, row
        log-softmax with NaN/-inf → neg_inf (reference ``:472``)."""
        phn_lens_abs = np.asarray(phn_lens_abs)
        batch_size = len(phn_lens_abs)
        u_max = int(np.max(phn_lens_abs))
        trans = np.eye(u_max) + np.eye(u_max, k=1)
        trans = np.broadcast_to(trans, (batch_size, u_max, u_max)).copy()
        valid = np.arange(u_max)[None, :] < phn_lens_abs[:, None]
        mask = valid[:, :, None] & valid[:, None, :]
        trans = trans * mask
        trans = np.where(trans == 1, trans, -np.inf)
        with np.errstate(invalid="ignore"):
            trans = _log_softmax(trans, axis=2)
        trans[np.isnan(trans)] = self.neg_inf
        trans[trans == -np.inf] = self.neg_inf
        return trans

    def _make_emiss_pred_useful(self, emission_pred, lens_abs, phn_lens_abs,
                                phns):
        """Gather the per-frame posteriors of each phn-sequence position:
        frames past ``lens_abs`` contribute 0, positions past
        ``phn_lens_abs`` neg_inf; → (B, U, T) (reference ``:538``)."""
        emission_pred = np.asarray(emission_pred, np.float64)
        u_max = int(np.max(phn_lens_abs))
        t_max = int(np.max(lens_abs))
        mask_lens = np.arange(t_max)[None, :] < np.asarray(lens_abs)[:, None]
        emiss = np.where(mask_lens[:, :, None], emission_pred[:, :t_max], 0.0)
        gathered = np.take_along_axis(
            emiss, np.broadcast_to(np.asarray(phns, np.int64)[:, None, :],
                                   emiss.shape[:2] + (phns.shape[1],)), axis=2)
        mask_phn = np.arange(phns.shape[1])[None, :] < np.asarray(
            phn_lens_abs)[:, None]
        gathered = np.where(mask_phn[:, None, :], gathered, self.neg_inf)
        return gathered[:, :, :u_max].transpose(0, 2, 1)

    # ----------------------------------------------------------------- DP

    def _dp_forward(self, pi_prob, trans_prob, emiss_pred_useful, lens_abs,
                    phn_lens_abs, phns):
        """Forward algorithm; finished utterances freeze via a 0-logprob
        self-loop identity, like the reference (``:596``)."""
        del phns
        batch_size = len(phn_lens_abs)
        u_max = int(np.max(phn_lens_abs))
        t_max = int(np.max(lens_abs))
        lens_abs = np.asarray(lens_abs)
        trans_prob = np.array(trans_prob, np.float64, copy=True)

        alpha = pi_prob + emiss_pred_useful[:, :, 0]
        identity = self.neg_inf * np.ones((u_max, u_max))
        np.fill_diagonal(identity, 0.0)
        for t in range(1, t_max):
            passed = lens_abs < t
            if passed.any():
                trans_prob[passed] = identity
            # logsumexp_j(trans[j, i] + alpha[j]) per row i
            scores = trans_prob.transpose(0, 2, 1) + alpha[:, None, :]
            m = scores.max(axis=2, keepdims=True)
            m = np.where(np.isfinite(m), m, 0.0)
            alpha = (m[..., 0] + np.log(np.exp(scores - m).sum(axis=2))
                     + emiss_pred_useful[:, :, t])
        return np.log(np.exp(alpha - alpha.max(1, keepdims=True)).sum(1)) \
            + alpha.max(1)

    def _dp_viterbi(self, pi_prob, trans_prob, emiss_pred_useful, lens_abs,
                    phn_lens_abs, phns, final_states):
        """Viterbi with backtrace from the last in-length frame
        (reference ``:668``). Returns (z_stars, z_stars_loc, scores)."""
        batch_size = len(phn_lens_abs)
        t_max = int(np.max(lens_abs))
        lens_abs = np.asarray(lens_abs)
        phn_lens_abs = np.asarray(phn_lens_abs)
        phns = np.asarray(phns, np.int64)

        v = pi_prob + emiss_pred_useful[:, :, 0]
        v_hist = [v]
        backpointers = [np.zeros_like(v, dtype=np.int64)]
        trans_t = trans_prob.transpose(0, 2, 1)
        for t in range(1, t_max):
            scores = trans_t + v[:, None, :]
            backpointers.append(scores.argmax(axis=2))
            v = scores.max(axis=2) + emiss_pred_useful[:, :, t]
            v_hist.append(v)
        v_matrix = np.stack(v_hist, axis=2)          # (B, U, T)
        backpointers = np.stack(backpointers, axis=2)

        z_stars, z_stars_loc = [], []
        for b in range(batch_size):
            len_abs = int(lens_abs[b])
            if final_states is not None:
                finals = list(final_states[b])
                chosen = int(np.argmax(
                    v_matrix[b, finals, len_abs - 1]))
                u = finals[chosen]
            else:
                u = int(phn_lens_abs[b]) - 1
            loc = [u]
            z_star = [int(phns[b, u])]
            for time_step in range(len_abs, 1, -1):
                earlier = int(backpointers[b, loc[0], time_step - 1])
                loc.insert(0, earlier)
                z_star.insert(0, int(phns[b, earlier]))
            z_stars.append(z_star)
            z_stars_loc.append(loc)
        viterbi_scores = v_matrix[np.arange(batch_size), phn_lens_abs - 1,
                                  lens_abs - 1]
        return z_stars, z_stars_loc, viterbi_scores

    def _loss_reduction(self, loss, input_lens, target_lens):
        """Optional length normalization + batch reduction (reference ``:782``)."""
        if self.input_len_norm:
            loss = loss / np.asarray(input_lens)
        if self.target_len_norm:
            loss = loss / np.asarray(target_lens)
        if self.batch_reduction == "none":
            return loss
        if self.batch_reduction == "sum":
            return loss.sum()
        if self.batch_reduction == "mean":
            return loss.mean()
        raise ValueError(
            "`batch_reduction` parameter must be one of 'none', 'sum' or "
            "'mean'")

    def forward(self, emission_pred, lens, phns, phn_lens, dp_algorithm,
                prob_matrices=None):
        """Main entry (reference ``:819``): relative lengths → DP.
        ``dp_algorithm`` "forward" returns per-utterance log-likelihoods;
        "viterbi" returns (scores, alignments). ``prob_matrices`` overrides
        {pi_prob, trans_prob, final_states} (the ``use_lexicon`` path)."""
        emission_pred = np.asarray(emission_pred, np.float64)
        lens_abs = np.round(
            emission_pred.shape[1] * np.asarray(lens)).astype(np.int64)
        phns = np.asarray(phns)
        phn_lens_abs = np.round(
            phns.shape[1] * np.asarray(phn_lens)).astype(np.int64)
        phns = phns.astype(np.int64)

        if prob_matrices is None:
            pi_prob = self._make_pi_prob(phn_lens_abs)
            trans_prob = self._make_trans_prob(phn_lens_abs)
            final_states = None
        else:
            pi_prob = prob_matrices["pi_prob"]
            trans_prob = prob_matrices["trans_prob"]
            final_states = prob_matrices["final_states"]

        emiss = self._make_emiss_pred_useful(emission_pred, lens_abs,
                                             phn_lens_abs, phns)
        if dp_algorithm == "forward":
            scores = self._dp_forward(pi_prob, trans_prob, emiss, lens_abs,
                                      phn_lens_abs, phns)
            return self._loss_reduction(scores, lens_abs, phn_lens_abs)
        if dp_algorithm == "viterbi":
            alignments, _, scores = self._dp_viterbi(
                pi_prob, trans_prob, emiss, lens_abs, phn_lens_abs, phns,
                final_states)
            return self._loss_reduction(scores, lens_abs, phn_lens_abs), \
                alignments
        raise ValueError(
            "dp_algorithm input must be either 'forward' or 'viterbi'")

    # ------------------------------------------------- alignment bookkeeping

    def expand_phns_by_states_per_phoneme(self, phns, phn_lens):
        """id → [spp·id .. spp·id + spp-1] per phoneme (reference ``:938``)."""
        phns = np.asarray(phns)
        spp = self.states_per_phoneme
        expanded = np.zeros((phns.shape[0], phns.shape[1] * spp))
        phn_lens_abs = np.round(
            phns.shape[1] * np.asarray(phn_lens)).astype(np.int64)
        for i in range(phns.shape[0]):
            utt = phns[i, : phn_lens_abs[i]].astype(np.int64)
            flat = [spp * p + j for p in utt for j in range(spp)]
            expanded[i, : len(flat)] = flat
        return expanded

    def store_alignments(self, ids, alignments):
        """Record Viterbi alignments for Viterbi training (reference ``:986``)."""
        for i, utt_id in enumerate(ids):
            self.align_dict[utt_id] = np.asarray(alignments[i], np.int16)

    def _get_flat_start_batch(self, lens_abs, phn_lens_abs, phns):
        """Equal-duration flat-start alignments (reference ``:1014``)."""
        phns = np.asarray(phns, np.int64)
        batch_size = len(lens_abs)
        t_max = int(np.max(lens_abs))
        out = np.zeros((batch_size, t_max), np.int64)
        for i in range(batch_size):
            utt = phns[i, : int(phn_lens_abs[i])]
            repeat_amt = max(int(int(lens_abs[i]) / len(utt)), 1)
            utt = np.repeat(utt, repeat_amt)[: int(lens_abs[i])]
            if len(utt) < int(lens_abs[i]):
                utt = np.pad(utt, (0, int(lens_abs[i]) - len(utt)),
                             constant_values=utt[-1])
            out[i, : len(utt)] = utt
        return out

    def _get_viterbi_batch(self, ids, lens_abs):
        """Zero-padded batch of stored alignments (reference ``:1072``)."""
        t_max = int(np.max(lens_abs))
        out = np.zeros((len(ids), t_max), np.int64)
        for i, utt_id in enumerate(ids):
            preds = np.asarray(self.align_dict[utt_id], np.int64)
            out[i, : len(preds)] = preds
        return out

    def get_prev_alignments(self, ids, emission_pred, lens, phns, phn_lens):
        """Stored Viterbi alignments if available, else flat start
        (reference ``:1107``).

        Example
        -------
        >>> import numpy as np
        >>> aligner = HMMAligner()
        >>> emission_pred = np.zeros((1, 6, 3))
        >>> batch = aligner.get_prev_alignments(
        ...     ["utt1"], emission_pred, np.array([1.0]),
        ...     np.array([[0, 1, 2]]), np.array([1.0]))
        >>> batch                      # flat start: equal durations
        array([[0, 0, 1, 1, 2, 2]])
        >>> aligner.store_alignments(["utt1"], [[0, 1, 1, 1, 2, 2]])
        >>> aligner.get_prev_alignments(
        ...     ["utt1"], emission_pred, np.array([1.0]),
        ...     np.array([[0, 1, 2]]), np.array([1.0]))
        array([[0, 1, 1, 1, 2, 2]])
        """
        emission_pred = np.asarray(emission_pred)
        lens_abs = np.round(
            emission_pred.shape[1] * np.asarray(lens)).astype(np.int64)
        phns = np.asarray(phns)
        phn_lens_abs = np.round(
            phns.shape[1] * np.asarray(phn_lens)).astype(np.int64)
        if ids[0] in self.align_dict:
            return self._get_viterbi_batch(ids, lens_abs)
        return self._get_flat_start_batch(lens_abs, phn_lens_abs, phns)

    # --------------------------------------------------------- evaluation

    def _calc_accuracy_sent(self, alignments_, ends_, phns_):
        """Sample-level accuracy for one utterance (reference ``:1164``)."""
        ends_ = [0] + [int(end) for end in ends_]
        durations = [ends_[i] - ends_[i - 1] for i in range(1, len(ends_))]
        true_alignments = np.concatenate(
            [np.full(d, p) for p, d in zip(phns_, durations)])
        upsample = int(round(len(true_alignments) / len(alignments_)))
        upsampled = np.repeat(np.asarray(alignments_), upsample)
        upsampled = upsampled[: len(true_alignments)]
        if len(true_alignments) > len(upsampled):
            upsampled = np.pad(upsampled,
                               (0, len(true_alignments) - len(upsampled)))
        return float((upsampled == true_alignments).mean() * 100)

    def calc_accuracy(self, alignments, ends, phns, ind2labs=None):
        """Mean sample-level accuracy vs ground-truth phoneme ends
        (reference ``:1216``); returns a length-1 array like the reference.

        Example
        -------
        >>> aligner = HMMAligner()
        >>> float(aligner.calc_accuracy([[0., 0., 0., 1.]], [[2, 4]],
        ...                             [[0., 1.]])[0])
        75.0
        """
        if self.states_per_phoneme > 1:
            alignments = [[i // self.states_per_phoneme for i in utt]
                          for utt in alignments]
        if ind2labs is not None:
            alignments, phns = map_inds_to_intersect(alignments, phns,
                                                     ind2labs)
        accs = [self._calc_accuracy_sent(a, e, p)
                for a, e, p in zip(alignments, ends, phns)]
        return np.asarray([np.mean(accs)])

    def collapse_alignments(self, alignments):
        """Multi-state alignments → 1-state-per-phoneme (reference ``:1275``).

        Example
        -------
        >>> aligner = HMMAligner(states_per_phoneme=3)
        >>> aligner.collapse_alignments([0, 1, 2, 3, 4, 5, 3, 4, 5, 0, 1, 2])
        [0, 1, 1, 0]
        """
        sequence = [v for i, v in enumerate(alignments)
                    if i == 0 or v != alignments[i - 1]]
        sequence = [v for v in sequence
                    if v % self.states_per_phoneme == 0]
        return [v // self.states_per_phoneme for v in sequence]

    # -------------------------------------------------------- persistence

    @mark_as_saver
    def _save(self, path):
        with open(path, "wb") as f:
            pickle.dump({k: np.asarray(v) for k, v in self.align_dict.items()},
                        f)

    @mark_as_loader
    def _load(self, path, end_of_epoch=False, device=None):
        del end_of_epoch, device
        with open(path, "rb") as f:
            self.align_dict = pickle.load(f)

    # ------------------------------------------------ convenience (ours)

    def align(self, emission_lp, phns):
        """Single-utterance Viterbi convenience: emission_lp (T, V), phns
        (U,) → (per-frame phoneme-position path (T,), score)."""
        emission_lp = np.asarray(emission_lp, np.float64)
        lens_abs = np.asarray([emission_lp.shape[0]])
        phn_lens_abs = np.asarray([len(phns)])
        phns_b = np.asarray([phns], np.int64)
        _, locs, scores = self._dp_viterbi(
            self._make_pi_prob(phn_lens_abs),
            self._make_trans_prob(phn_lens_abs),
            self._make_emiss_pred_useful(emission_lp[None], lens_abs,
                                         phn_lens_abs, phns_b),
            lens_abs, phn_lens_abs, phns_b, None)
        return np.asarray(locs[0]), float(scores[0])


def batch_log_matvecmul(A, b):
    """Log-space matrix × vector: out[i] = logsumexp_j(A[ij] + b[j]),
    batched (reference ``aligner.py:1077``).

    Example
    -------
    >>> import numpy as np, jax.numpy as jnp
    >>> A = jnp.log(jnp.asarray([[[0.5, 0.5], [0.25, 0.75]]]))
    >>> b = jnp.log(jnp.asarray([[0.5, 0.5]]))
    >>> np.round(np.exp(np.asarray(batch_log_matvecmul(A, b))), 3)
    array([[0.5, 0.5]], dtype=float32)
    """
    return jax.nn.logsumexp(A + b[:, None, :], axis=-1)


def batch_log_maxvecmul(A, b):
    """Max-plus matrix × vector with argmax, batched
    (reference ``aligner.py:1107``): returns (max values, argmax indices).

    Example
    -------
    >>> import numpy as np, jax.numpy as jnp
    >>> A = jnp.log(jnp.asarray([[[0.5, 0.5], [0.25, 0.75]]]))
    >>> b = jnp.log(jnp.asarray([[0.5, 0.5]]))
    >>> v, idx = batch_log_maxvecmul(A, b)
    >>> np.round(np.exp(np.asarray(v)), 3), np.asarray(idx)
    (array([[0.25 , 0.375]], dtype=float32), array([[0, 1]], dtype=int32))
    """
    import jax.numpy as jnp

    scores = A + b[:, None, :]
    return jnp.max(scores, axis=-1), jnp.argmax(scores, axis=-1)


def map_inds_to_intersect(lists1, lists2, ind2labs):
    """Map two index-sequence lists onto a shared label-intersection index
    space (reference ``aligner.py:1340``). Returns (mapped1, mapped2,
    new_lab2ind)."""
    ind2lab1, ind2lab2 = ind2labs
    labs = sorted(set(ind2lab1.values()) | set(ind2lab2.values()))
    new_lab2ind = {lab: i for i, lab in enumerate(labs)}
    mapped1 = [[new_lab2ind[ind2lab1[i]] for i in seq] for seq in lists1]
    mapped2 = [[new_lab2ind[ind2lab2[i]] for i in seq] for seq in lists2]
    return mapped1, mapped2, new_lab2ind
