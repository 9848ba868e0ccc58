"""Seq2seq decoding (analogue of reference ``speechbrain/decoders/seq2seq.py``).

A searcher wraps a step function ``forward_step(inp_tokens, memory, enc_states,
enc_lens) → (log_probs, memory, attn)`` — supplied by model adapters — and
runs greedy or beam search host-side with jnp math per step (decoding is off
the TPU training hot path; batched beams keep the device busy during the
matmuls).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


class S2SBaseSearcher:
    """Reference ``seq2seq.py:15``."""

    def __init__(self, bos_index, eos_index, min_decode_ratio, max_decode_ratio):
        self.bos_index = bos_index
        self.eos_index = eos_index
        self.min_decode_ratio = min_decode_ratio
        self.max_decode_ratio = max_decode_ratio

    def forward_step(self, inp_tokens, memory, enc_states, enc_lens):
        raise NotImplementedError

    def reset_mem(self, batch_size):
        return None


class S2SGreedySearcher(S2SBaseSearcher):
    """Greedy decoding (reference ``seq2seq.py:181``)."""

    def __call__(self, enc_states, enc_lens):
        batch_size = enc_states.shape[0]
        memory = self.reset_mem(batch_size)
        inp_tokens = jnp.full((batch_size,), self.bos_index, jnp.int32)
        max_steps = int(enc_states.shape[1] * self.max_decode_ratio)
        log_probs_lst = []
        tokens = []
        for _ in range(max_steps):
            log_probs, memory, _ = self.forward_step(
                inp_tokens, memory, enc_states, enc_lens)
            inp_tokens = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
            log_probs_lst.append(log_probs)
            tokens.append(inp_tokens)
        tokens = np.stack([np.asarray(t) for t in tokens], axis=1)
        hyps, scores = [], []
        all_log_probs = np.stack([np.asarray(lp) for lp in log_probs_lst], axis=1)
        for b in range(batch_size):
            seq = tokens[b].tolist()
            if self.eos_index in seq:
                seq = seq[:seq.index(self.eos_index)]
            hyps.append(seq)
            scores.append(float(all_log_probs[b, np.arange(len(tokens[b])),
                                              tokens[b]].sum()))
        return hyps, scores


class S2SRNNGreedySearcher(S2SGreedySearcher):
    """Greedy search over an embedding + AttentionalRNNDecoder + linear
    stack (reference ``seq2seq.py:242``)."""

    def __init__(self, embedding, decoder, linear, params, **kwargs):
        super().__init__(**kwargs)
        self.emb = embedding
        self.dec = decoder
        self.fc = linear
        self.params = params  # {"emb":..., "dec":..., "fc":...}

    def reset_mem(self, batch_size):
        return {"hs": None, "attn_state": None,
                "c": jnp.zeros((batch_size, self.dec.attn_dim))}

    def forward_step(self, inp_tokens, memory, enc_states, enc_lens):
        e = self.emb(self.params["emb"], inp_tokens)
        # the reference converts relative wav_len to frames at the searcher
        # top (seq2seq.py:158); our searcher passes relative lengths through
        enc_len = jnp.round(enc_states.shape[1] * jnp.asarray(enc_lens))
        dec_out, hs, c, w, attn_state = self.dec.forward_step(
            self.params["dec"], e, memory["hs"], memory["c"], enc_states,
            enc_len, memory["attn_state"])
        log_probs = jax.nn.log_softmax(self.fc(self.params["fc"], dec_out), axis=-1)
        return log_probs, {"hs": hs, "c": c, "attn_state": attn_state}, w


class S2SBeamSearcher(S2SBaseSearcher):
    """Batched beam search with length penalties and optional eos thresholding
    (reference ``seq2seq.py:286``). Subclasses/adapters supply
    ``forward_step`` and ``permute_mem``."""

    def __init__(self, bos_index, eos_index, min_decode_ratio, max_decode_ratio,
                 beam_size, scorer=None, return_topk=False, topk=1,
                 using_eos_threshold=True, eos_threshold=1.5,
                 length_normalization=True, length_rewarding=0,
                 ctc_weight=0.0, blank_index=0, ctc_score_mode="full",
                 ctc_window_size=0, using_max_attn_shift=False,
                 max_attn_shift=60, coverage_penalty=0.0, lm_weight=0.0,
                 minus_inf=-1e20):
        super().__init__(bos_index, eos_index, min_decode_ratio, max_decode_ratio)
        self.beam_size = beam_size
        self.scorer = scorer
        self.return_topk = return_topk
        self.topk = topk
        self.using_eos_threshold = using_eos_threshold
        self.eos_threshold = eos_threshold
        self.length_normalization = length_normalization
        self.length_rewarding = length_rewarding
        self.minus_inf = minus_inf
        # joint CTC/attention decoding (reference seq2seq.py:361-379)
        self.ctc_weight = ctc_weight
        self.blank_index = blank_index
        self.att_weight = 1.0 - ctc_weight
        assert 0.0 <= self.ctc_weight <= 1.0, \
            "ctc_weight should not > 1.0 and < 0.0"
        if self.ctc_weight > 0.0 and len(
                {self.bos_index, self.eos_index, self.blank_index}) < 3:
            raise ValueError(
                "To perform joint ATT/CTC decoding, set blank, eos and bos "
                "to different indexes.")
        self.ctc_score_mode = ctc_score_mode
        self.ctc_window_size = ctc_window_size
        # attention-peak monotonicity + coverage (reference seq2seq.py:637,728)
        self.using_max_attn_shift = using_max_attn_shift
        self.max_attn_shift = max_attn_shift
        self.coverage_penalty = coverage_penalty
        # LM shallow fusion happens in the BASE loop after the eos threshold
        # and before CTC, unscaled by att_weight (reference seq2seq.py:658)
        self.lm_weight = lm_weight

    def lm_forward_step(self, inp_tokens, memory):
        """LM log-probs for the next token (reference ``:110``); subclasses
        with ``lm_weight > 0`` provide this."""
        raise NotImplementedError

    def reset_lm_mem(self, batch_size):
        """Initial LM memory (reference ``:132``)."""
        return None

    def permute_lm_mem(self, memory, index):
        """Reorder LM memory after top-k (reference ``:715``)."""
        return memory

    def ctc_forward_step(self, x):
        """CTC head log-posteriors over encoder states (reference ``:825``);
        subclasses provide ``self.ctc_fc``/params."""
        raise NotImplementedError(
            "Joint CTC decoding requires the subclass to implement "
            "ctc_forward_step (a CTC output head over encoder states).")

    def permute_mem(self, memory, index):
        """Reorder recurrent state after top-k; default none."""
        return memory

    def __call__(self, enc_states, enc_lens):
        batch_size = enc_states.shape[0]
        beam = self.beam_size
        ctc_scorer, ctc_memory = None, None
        if self.ctc_weight > 0.0:
            from svt_speechbrain_tpu.decoders.ctc import CTCPrefixScorer

            enc_lens_abs = np.round(
                enc_states.shape[1] * np.asarray(enc_lens)).astype(np.int64)
            ctc_outputs = self.ctc_forward_step(enc_states)
            ctc_scorer = CTCPrefixScorer(
                np.asarray(ctc_outputs), enc_lens_abs, batch_size, beam,
                self.blank_index, self.eos_index, self.ctc_window_size)
        # expand encoder states to beams
        enc_states_b = jnp.repeat(enc_states, beam, axis=0)
        enc_lens_b = jnp.repeat(jnp.asarray(enc_lens), beam, axis=0)
        memory = self.reset_mem(batch_size * beam)
        lm_memory = (self.reset_lm_mem(batch_size * beam)
                     if self.lm_weight > 0 else None)

        inp_tokens = jnp.full((batch_size * beam,), self.bos_index, jnp.int32)
        # only the first beam of each batch is alive initially
        scores = jnp.full((batch_size, beam), self.minus_inf)
        scores = scores.at[:, 0].set(0.0).reshape(-1)

        hyps = [[] for _ in range(batch_size * beam)]
        finished = [[] for _ in range(batch_size)]  # (tokens, score)
        max_steps = int(enc_states.shape[1] * self.max_decode_ratio)
        min_steps = int(enc_states.shape[1] * self.min_decode_ratio)
        prev_attn_peak = np.zeros(batch_size * beam)
        coverage = None
        finalize_scores = np.full(batch_size * beam, -np.inf)

        for step in range(max_steps):
            log_probs, memory, attn = self.forward_step(
                inp_tokens, memory, enc_states_b, enc_lens_b)
            vocab = log_probs.shape[-1]
            # writable host copy (np.asarray of a jax array is read-only)
            log_probs = self.att_weight * np.array(log_probs)
            if self.using_max_attn_shift:
                # block candidates whose attention peak jumped too far
                # (reference _check_attn_shift, seq2seq.py:420)
                attn_np = np.asarray(attn)
                attn_peak = attn_np.argmax(axis=1)
                cond = ((attn_peak <= prev_attn_peak + self.max_attn_shift)
                        & (attn_peak > prev_attn_peak - self.max_attn_shift))
                log_probs = np.where(cond[:, None], log_probs,
                                     self.minus_inf)
            if step < min_steps:
                log_probs[:, self.eos_index] = self.minus_inf
            if self.using_eos_threshold:
                max_probs = log_probs.max(axis=-1)
                thresh = self.eos_threshold * max_probs
                # reference keeps eos only when STRICTLY above threshold
                # (seq2seq.py:447 ``eos_probs > thresh``) — mask at <=,
                # which matters when attention log-probs are identically
                # zero (pure-CTC joint decoding).
                bad_eos = log_probs[:, self.eos_index] <= thresh
                log_probs[bad_eos, self.eos_index] = self.minus_inf

            if self.lm_weight > 0:
                lm_log_probs, lm_memory = self.lm_forward_step(inp_tokens,
                                                               lm_memory)
                log_probs = log_probs + self.lm_weight * np.asarray(
                    lm_log_probs)

            if ctc_scorer is not None:
                # joint scoring (reference seq2seq.py:666-682): block blank,
                # optionally prune the scorer's vocab to 2*beam candidates
                g = np.asarray(hyps, np.int64)
                if g.ndim != 2:   # step 0: prefixes are empty
                    g = np.zeros((batch_size * beam, 0), np.int64)
                log_probs[:, self.blank_index] = self.minus_inf
                if self.ctc_weight != 1.0 and self.ctc_score_mode == "partial":
                    ctc_candidates = np.argsort(
                        -log_probs, axis=-1)[:, : 2 * beam]
                else:
                    ctc_candidates = None
                ctc_log_probs, ctc_memory = ctc_scorer.forward_step(
                    g, ctc_memory, ctc_candidates,
                    None if attn is None else np.asarray(attn))
                # float32 like the reference: in saturated (-1e20-dominated)
                # regimes the tie structure is precision-dependent
                log_probs = (log_probs + self.ctc_weight
                             * ctc_log_probs).astype(np.float32)

            cand = np.asarray(scores)[:, None] + log_probs  # (B*beam, V)
            cand = cand.reshape(batch_size, beam * vocab)
            # stable sort: ties resolve to the lowest flat index, like
            # torch.topk in the reference
            top_scores_idx = np.argsort(-cand, axis=1,
                                        kind="stable")[:, :beam]
            top_scores = np.take_along_axis(cand, top_scores_idx, axis=1)
            beam_idx = top_scores_idx // vocab  # within-batch beam index
            tok_idx = top_scores_idx % vocab

            flat_beam_idx = (beam_idx + np.arange(batch_size)[:, None] * beam).reshape(-1)
            new_hyps = [hyps[i] + [int(t)] for i, t in
                        zip(flat_beam_idx, tok_idx.reshape(-1))]
            hyps = new_hyps
            scores = jnp.asarray(top_scores.reshape(-1))
            inp_tokens = jnp.asarray(tok_idx.reshape(-1), jnp.int32)
            memory = self.permute_mem(memory, jnp.asarray(flat_beam_idx))
            if self.lm_weight > 0:
                lm_memory = self.permute_lm_mem(lm_memory, flat_beam_idx)
            if ctc_scorer is not None:
                ctc_memory = ctc_scorer.permute_mem(ctc_memory,
                                                    top_scores_idx)
            if self.using_max_attn_shift:
                prev_attn_peak = attn_peak[flat_beam_idx]

            # the score an eos/force-finalized hypothesis is STORED with:
            # normalized, minus the coverage penalty — which, like the
            # reference (seq2seq.py:728-755), never feeds back into the
            # running accumulation
            finalize_scores = np.asarray(scores, np.float64).copy()
            if self.length_normalization:
                finalize_scores = finalize_scores / (step + 1)
            if self.coverage_penalty > 0:
                cur_attn = np.asarray(attn)[flat_beam_idx]
                if cur_attn.ndim > 2:
                    # transformer attention (B*beam, steps, src): cumulative
                    # coverage is the sum over decoded steps (the evident
                    # intent; the reference's 3-dim branch assigns a typo'd
                    # attribute and never updates)
                    coverage = cur_attn.sum(axis=1)
                else:
                    # the reference's t==0 branch FALLS THROUGH into the
                    # update, double-permuting and double-counting the first
                    # step's attention (seq2seq.py:728-748) — mirrored
                    base = cur_attn if step == 0 else coverage
                    coverage = base[flat_beam_idx] + cur_attn
                penalty = (np.maximum(coverage, 0.5).sum(axis=-1)
                           - coverage.shape[-1] * 0.5)
                if self.length_normalization:
                    penalty = penalty / (step + 1)
                finalize_scores = finalize_scores \
                    - penalty * self.coverage_penalty

            # collect finished (reference _update_hyp_and_scores: per-batch
            # cap at beam_size, first-come kept)
            ended = np.asarray(inp_tokens) == self.eos_index
            for i in np.flatnonzero(ended):
                b = i // beam
                if len(finished[b]) == beam:
                    continue
                seq = hyps[i][:-1]
                score = float(finalize_scores[i]) \
                    + self.length_rewarding * (step + 1)
                finished[b].append((seq, score))
            for i in np.flatnonzero(ended):
                # true -inf like the reference: a finished row's candidates
                # all tie at -inf and can never re-enter the ranking
                scores = scores.at[i].set(-np.inf)
            if all(len(f) == beam for f in finished):
                break
        # force-finalize still-alive rows like the reference's end-of-loop
        # all-eos fill (reference seq2seq.py:792-806): stored with the LAST
        # iteration's (penalized, normalized) scores
        if not all(len(f) == beam for f in finished):
            for i in range(batch_size * beam):
                b = i // beam
                if len(finished[b]) == beam:
                    continue
                seq = hyps[i]
                sc = float(finalize_scores[i]) \
                    + self.length_rewarding * (max_steps + 1)
                finished[b].append((seq, sc))
        out_hyps, out_scores = [], []
        for b in range(batch_size):
            ranked = sorted(finished[b], key=lambda t: -t[1])
            # trim at the first eos like the reference's output filter
            # (force-finalized rows may carry an earlier eos mid-sequence)
            ranked = [(filter_seq2seq_output(list(map(int, h)),
                                             eos_id=self.eos_index), s)
                      for h, s in ranked]
            if self.return_topk:
                out_hyps.append([h for h, s in ranked[:self.topk]])
                out_scores.append([s for h, s in ranked[:self.topk]])
            else:
                out_hyps.append(ranked[0][0])
                out_scores.append(ranked[0][1])
        return out_hyps, out_scores


class S2SRNNBeamSearcher(S2SBeamSearcher):
    """Beam search over embedding + AttentionalRNNDecoder + linear
    (reference ``seq2seq.py:699``)."""

    def __init__(self, embedding, decoder, linear, params, temperature=1.0,
                 ctc_linear=None, **kwargs):
        super().__init__(**kwargs)
        self.emb = embedding
        self.dec = decoder
        self.fc = linear
        self.params = params
        self.temperature = temperature
        self.ctc_fc = ctc_linear
        if self.ctc_weight > 0.0 and self.ctc_fc is None:
            raise ValueError(
                "To perform joint ATT/CTC decoding, ctc_fc is required.")

    def ctc_forward_step(self, x):
        """CTC log-posteriors over encoder states (reference ``:825``);
        params under ``params['ctc_fc']``."""
        logits = self.ctc_fc(self.params["ctc_fc"], x)
        return jax.nn.log_softmax(logits, axis=-1)

    def reset_mem(self, batch_size):
        return {"hs": None, "c": None, "attn_state": None,
                "batch_size": batch_size}

    def forward_step(self, inp_tokens, memory, enc_states, enc_lens):
        e = self.emb(self.params["emb"], inp_tokens)
        c = memory["c"]
        if c is None:
            c = jnp.zeros((inp_tokens.shape[0], self.dec.attn_dim))
        enc_len = jnp.round(enc_states.shape[1] * jnp.asarray(enc_lens))
        dec_out, hs, c, w, attn_state = self.dec.forward_step(
            self.params["dec"], e, memory["hs"], c, enc_states, enc_len,
            memory["attn_state"])
        log_probs = jax.nn.log_softmax(
            self.fc(self.params["fc"], dec_out) / self.temperature, axis=-1)
        return log_probs, {"hs": hs, "c": c, "attn_state": attn_state,
                           "batch_size": memory["batch_size"]}, w

    def permute_mem(self, memory, index):
        hs = memory["hs"]
        if hs is not None:
            def sel(s):
                if isinstance(s, tuple):
                    return tuple(x[index] for x in s)
                return s[index]

            hs = [sel(s) for s in hs]
        c = memory["c"][index] if memory["c"] is not None else None
        attn_state = (memory["attn_state"][index]
                      if memory["attn_state"] is not None else None)
        return {"hs": hs, "c": c, "attn_state": attn_state,
                "batch_size": memory["batch_size"]}


def filter_seq2seq_output(string_pred, eos_id=-1):
    """Trim everything from the first eos (reference ``seq2seq.py:1278``).

    Example
    -------
    >>> filter_seq2seq_output([3, 5, 2, 7], eos_id=2)
    [3, 5]
    >>> filter_seq2seq_output([3, 5], eos_id=2)     # no eos: unchanged
    [3, 5]
    """
    if not isinstance(string_pred, list):
        raise ValueError("The input must be a list.")
    try:
        first = next(i for i, v in enumerate(string_pred) if v == eos_id)
        return string_pred[:first]
    except StopIteration:
        return string_pred


def batch_filter_seq2seq_output(prediction, eos_id=-1):
    """Apply ``filter_seq2seq_output`` per batch item
    (reference ``seq2seq.py:1247``)."""
    return [filter_seq2seq_output(list(map(int, p)), eos_id=eos_id)
            for p in prediction]


def inflate_tensor(tensor, times, dim):
    """Repeat along ``dim`` (reference ``seq2seq.py:1180``)."""
    return jnp.repeat(tensor, times, axis=dim)


def mask_by_condition(tensor, cond, fill_value):
    """Keep where cond else fill (reference ``seq2seq.py:1212``)."""
    return jnp.where(cond, tensor, fill_value)


class S2SRNNBeamSearchLM(S2SRNNBeamSearcher):
    """RNN beam search + RNNLM shallow fusion
    (reference ``seq2seq.py:836``): token scores become
    ``log p_asr + lm_weight · log p_lm``. The LM prefix is re-scored per step
    (prefixes are short; re-running the jitted LM keeps the memory pytree
    trivially permutable)."""

    def __init__(self, embedding, decoder, linear, language_model, lm_params,
                 params, lm_weight=0.0, temperature_lm=1.0, **kwargs):
        super().__init__(embedding, decoder, linear, params,
                         lm_weight=lm_weight, **kwargs)
        self.lm = language_model
        self.lm_params = lm_params
        self.temperature_lm = temperature_lm

    def reset_lm_mem(self, batch_size):
        """LM memory = the token prefix (re-scored per step; prefixes are
        short and the jitted LM caches one program per length)."""
        return np.full((batch_size, 0), self.bos_index, np.int32)

    def lm_forward_step(self, inp_tokens, memory):
        """Fused in the BASE loop after the eos threshold, unscaled by
        att_weight — the reference's placement (seq2seq.py:658)."""
        prefix = np.concatenate(
            [memory, np.asarray(inp_tokens)[:, None]], axis=1)
        out = self.lm(self.lm_params, jnp.asarray(prefix))
        logits = out[0] if isinstance(out, tuple) else out
        log_probs = jax.nn.log_softmax(
            logits[:, -1] / self.temperature_lm, axis=-1)
        return log_probs, prefix

    def permute_lm_mem(self, memory, index):
        return memory[np.asarray(index)]


class S2SRNNBeamSearchTransformerLM(S2SRNNBeamSearchLM):
    """RNN beam search + transformer-LM shallow fusion
    (reference ``seq2seq.py:939``); identical prefix-rescoring mechanics —
    the LM callable just happens to be a TransformerLM."""


class S2STransformerBeamSearch(S2SBeamSearcher):
    """Beam search over a TransformerASR model (reference
    ``seq2seq.py:1119``): modules = [model, seq_lin] (+ optional ctc_lin for
    joint decoding); each step decodes the full token prefix (static-shape
    growth, XLA caches one program per prefix length) and reads the last
    position's logits."""

    def __init__(self, modules, params, temperature=1.0, **kwargs):
        super().__init__(**kwargs)
        self.model = modules[0]
        self.seq_lin = modules[1]
        self.model_params = params[0]
        self.lin_params = params[1]
        self.ctc_fc = modules[2] if len(modules) > 2 else None
        self.ctc_params = params[2] if len(params) > 2 else None
        self.temperature = temperature
        if self.ctc_weight > 0.0 and self.ctc_fc is None:
            raise ValueError(
                "To perform joint ATT/CTC decoding, pass ctc_lin as "
                "modules[2]/params[2].")

    def ctc_forward_step(self, x):
        logits = self.ctc_fc(self.ctc_params, x)
        return jax.nn.log_softmax(logits, axis=-1)

    def reset_mem(self, batch_size):
        return {"prefix": np.zeros((batch_size, 0), np.int32)}

    def forward_step(self, inp_tokens, memory, enc_states, enc_lens):
        prefix = np.concatenate(
            [memory["prefix"], np.asarray(inp_tokens)[:, None]], axis=1)
        dec_out = self.model.decode(self.model_params, jnp.asarray(prefix),
                                    enc_states)
        logits = self.seq_lin(self.lin_params, dec_out[:, -1])
        log_probs = jax.nn.log_softmax(logits / self.temperature, axis=-1)
        return log_probs, {"prefix": prefix}, None

    def permute_mem(self, memory, index):
        return {"prefix": memory["prefix"][np.asarray(index)]}
