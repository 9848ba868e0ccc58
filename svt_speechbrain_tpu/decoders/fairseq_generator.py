"""fairseq-semantics beam search for seq2seq decoders.

The reference vendors fairseq's ``SequenceGenerator``
(``speechbrain/lobes/models/sequence_generator.py:20``, 985 lines) to decode
AV-HuBERT ``hubert_asr`` seq2seq checkpoints. Its beam semantics differ from
the speechbrain searchers in ``decoders/seq2seq.py``:

- each step ranks ``2 * beam`` candidates over (cumulative score + lprob),
  using only beam 0 at step 0, and **never selects pad** (the top-k width is
  clipped to ``vocab - 1``);
- EOS candidates are only finalized from the top ``beam`` ranks; finalized
  scores are normalized by ``(step + 1) ** len_penalty``;
- non-EOS survivors are the ``beam`` smallest entries of the
  eos/ignore-penalized candidate ranking (fairseq's ``active_mask`` trick);
- a sentence finishes when ``beam`` hypotheses are finalized or the step
  loop hits ``max_len``; hypotheses are returned sorted by normalized score.

This module reimplements those semantics TPU-first, at three altitudes:

- ``generate()`` — the per-step decoder call is ONE jitted static-shape
  program (KV-cache incremental step from ``models/seq2seq_decoder.py``)
  shared by every step; the O(beam) bookkeeping runs host-side in numpy.
  This is the fully general path (LM fusion, prefix forcing, ensembles).
- the in-``generate()`` fast path — candidate selection moves on device
  too, so only ONE packed (3, B, 2*beam) array crosses the link per step.
- ``generate_on_device()`` — the WHOLE search (finalization, the
  active_mask survivor trick, cache reorder) is a single
  ``lax.while_loop`` program: one dispatch and one fetch per utterance
  batch, the TPU-serving decode path.

All three are golden-tested token-for-token against the vendored reference
generator (directly, or via equality with the host loop) in
``tests/test_seq2seq_decode_golden.py``.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


class FairseqSequenceGenerator:
    """Beam-decode a ``FairseqTransformerDecoder`` over encoder features.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> from svt_speechbrain_tpu.models.seq2seq_decoder import (
    ...     FairseqDecoderConfig, FairseqTransformerDecoder)
    >>> cfg = FairseqDecoderConfig(vocab_size=9, embed_dim=8, ffn_dim=16,
    ...                            num_layers=1, num_heads=2)
    >>> dec = FairseqTransformerDecoder(cfg)
    >>> params = dec.init(jax.random.PRNGKey(0))
    >>> gen = FairseqSequenceGenerator(dec, beam_size=2, max_len_b=5)
    >>> enc = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8))
    >>> out = gen.generate(params, enc)
    >>> len(out), sorted(out[0][0])
    (2, ['positional_scores', 'score', 'tokens'])
    >>> int(out[0][0]["tokens"][-1])   # every hypothesis ends in EOS
    2
    """

    def __init__(self, decoder, beam_size=5, max_len_a=0.0, max_len_b=200,
                 min_len=1, normalize_scores=True, len_penalty=1.0,
                 unk_penalty=0.0, temperature=1.0, pad=None, unk=None,
                 eos=None, lm=None, lm_weight=1.0):
        self.decoder = decoder
        # shallow-fusion LM (reference ``sequence_generator.py:344-351``):
        # a callable tokens_so_far (N, t+1) -> last-position LOG-probs
        # (N, V); fairseq multiplies the log-probs by lm_weight
        self.lm = lm
        self.lm_weight = lm_weight
        vocab = decoder.cfg.vocab_size
        self.vocab_size = vocab
        self.beam_size = min(beam_size, vocab - 1)
        self.max_len_a = max_len_a
        self.max_len_b = max_len_b
        self.min_len = min_len
        self.normalize_scores = normalize_scores
        self.len_penalty = len_penalty
        self.unk_penalty = unk_penalty
        self.temperature = temperature
        # fairseq Dictionary defaults: <s>=0 is bos, <pad>=1, </s>=2, <unk>=3
        self.pad = decoder.cfg.padding_idx if pad is None else pad
        self.eos = 2 if eos is None else eos
        self.unk = 3 if unk is None else unk

        @jax.jit
        def _step(params, cache, tokens_t, t):
            logits, cache = decoder.step(params, cache, tokens_t, t)
            lp = jax.nn.log_softmax(
                logits.astype(jnp.float32) / self.temperature, axis=-1)
            return lp, cache

        self._step = _step

        beam, pad, unk, eos = (self.beam_size, self.pad, self.unk, self.eos)

        @jax.jit
        def _step_select(params, cache, tokens_t, t, cum, max_len):
            """Fast path: decoder step + candidate selection ON DEVICE —
            ONE packed (3, B, 2*beam) int32 array crosses the link per
            step (scores bitcast to int32) instead of the whole
            (B*beam, V) lprobs matrix; a single fetch per step matters
            because the relayed link charges a fixed latency PER
            transfer, not just per byte. ``t``/``max_len`` are traced
            scalars, so ONE program serves every step."""
            lp, cache = _step(params, cache, tokens_t, t)
            v = lp.shape[-1]
            col = jnp.arange(v)[None, :]
            lp = jnp.where(jnp.isnan(lp), -jnp.inf, lp)
            lp = lp.at[:, pad].set(-jnp.inf)
            lp = lp.at[:, unk].add(-self.unk_penalty)
            lp = jnp.where((t >= max_len) & (col != eos), -jnp.inf, lp)
            lp = jnp.where((t < self.min_len) & (col == eos), -jnp.inf, lp)
            flat = (lp + cum[:, None]).reshape(-1, beam * v)
            # step 0: every beam is identical — only beam 0 competes
            beam_ix = jnp.repeat(jnp.arange(beam), v)[None, :]
            flat = jnp.where((t == 0) & (beam_ix > 0), -jnp.inf, flat)
            cs, idx = jax.lax.top_k(flat, 2 * beam)
            packed = jnp.stack([
                jax.lax.bitcast_convert_type(cs.astype(jnp.float32),
                                             jnp.int32),
                (idx % v).astype(jnp.int32),
                (idx // v).astype(jnp.int32),
            ])
            return packed, cache

        self._step_select = _step_select

    # ------------------------------------------------------------------

    def _candidates(self, step, lprobs, scores):
        """fairseq ``search.BeamSearch.step``: top ``2*beam`` of the
        flattened (beam, vocab) cumulative scores; never selects pad."""
        bsz, beams, vocab = lprobs.shape
        if step == 0:
            flat = lprobs[:, 0]                      # only the first beam
        else:
            flat = (lprobs + scores[:, :, None]).reshape(bsz, -1)
        k = min(2 * self.beam_size, flat.shape[1] - 1)
        order = np.argsort(-flat, axis=1, kind="stable")[:, :k]
        cand_scores = np.take_along_axis(flat, order, axis=1)
        cand_beams = order // vocab if step > 0 else np.zeros_like(order)
        cand_tokens = order % vocab if step > 0 else order
        return cand_scores, cand_tokens, cand_beams

    def _prefix_tokens(self, step, lprobs, scores, tokens, prefix_tokens,
                       beam, bsz):
        """Force ``prefix_tokens[:, step]`` (reference ``:568-597``): rows
        with a non-pad prefix token keep ONLY that token's lprob; an EOS in
        the prefix replicates beam 0 across the sentence's beams."""
        ptoks = np.repeat(prefix_tokens[:, step], beam)          # (B*beam,)
        plp = lprobs[np.arange(len(ptoks)), ptoks].copy()
        forced = np.where(ptoks != self.pad)[0]
        lprobs[forced, :] = -np.inf
        lprobs[forced, ptoks[forced]] = plp[forced]
        eos_rows = ptoks == self.eos
        if eos_rows.any():
            sent_mask = eos_rows.reshape(bsz, beam)[:, 0]

            def replicate_first_beam(arr):
                v = arr.reshape(bsz, beam, -1)
                v[sent_mask] = v[sent_mask][:, :1, :]
                return v.reshape(bsz * beam, -1)

            tokens = replicate_first_beam(tokens)
            scores = replicate_first_beam(scores)
            lprobs = replicate_first_beam(lprobs)
        return lprobs, tokens, scores

    def _host_candidates(self, members, caches, tokens, scores,
                         prefix_tokens, step, max_len, bsz, beam):
        """Full-lprobs host path (LM fusion / prefix forcing / ensembles /
        tiny vocabs). Mutates ``tokens``/``scores`` in place for the
        eos-in-prefix replication case."""
        member_lps = []
        for mi, p in enumerate(members):
            lp, caches[mi] = self._step(
                p, caches[mi], jnp.asarray(tokens[:, step]), step)
            member_lps.append(np.asarray(lp, np.float32))
        if len(member_lps) == 1:
            # a mutable fp32 copy (the reference accumulates fp32)
            lprobs = np.array(member_lps[0], np.float32)
        else:  # fairseq EnsembleModel: logsumexp average of log-probs
            stacked = np.stack(member_lps)
            mx = stacked.max(axis=0)
            lprobs = (mx + np.log(np.exp(stacked - mx).sum(axis=0))
                      - np.log(len(member_lps))).astype(np.float32)
        if self.lm is not None:
            lprobs = lprobs + self.lm_weight * np.asarray(
                self.lm(tokens[:, : step + 1]), np.float32)
        lprobs[np.isnan(lprobs)] = -np.inf
        lprobs[:, self.pad] = -np.inf
        lprobs[:, self.unk] -= self.unk_penalty
        if step >= max_len:                      # force EOS
            lprobs[:, : self.eos] = -np.inf
            lprobs[:, self.eos + 1:] = -np.inf

        if (prefix_tokens is not None and step < prefix_tokens.shape[1]
                and step < max_len):
            lprobs, new_tokens, new_scores = self._prefix_tokens(
                step, lprobs, scores, tokens,
                np.asarray(prefix_tokens), beam, bsz)
            tokens[:] = new_tokens
            scores[:] = new_scores
        elif step < self.min_len:
            # min-length does not apply while forcing a prefix
            lprobs[:, self.eos] = -np.inf

        return self._candidates(
            step, lprobs.reshape(bsz, beam, -1),
            scores[:, step - 1].reshape(bsz, beam) if step > 0 else None)

    def generate(self, params, encoder_out, encoder_padding_mask=None,
                 bos_token=None, prefix_tokens=None):
        """Decode a batch. Returns, per sentence, ``beam_size`` hypothesis
        dicts (``tokens`` incl. the final EOS, ``score``,
        ``positional_scores``) sorted by descending score — the reference
        generator's ``finalized`` contract.

        ``params`` may be a LIST of param trees for the same decoder
        architecture: an ensemble, scored as fairseq's ``EnsembleModel``
        (logsumexp-average of member log-probs). ``prefix_tokens``
        (B, P) int forces the first P tokens per sentence (pad = no
        constraint at that position)."""
        members = params if isinstance(params, (list, tuple)) else [params]
        bsz = int(encoder_out.shape[0])
        beam = self.beam_size
        src_len = int(encoder_out.shape[1])
        max_len = min(int(self.max_len_a * src_len + self.max_len_b),
                      self.decoder.cfg.max_target_positions - 1)
        bos = self.eos if bos_token is None else bos_token

        # beam-expand the encoder (B*beam rows, beam-major like fairseq)
        order = np.repeat(np.arange(bsz), beam)
        enc = jnp.take(encoder_out, jnp.asarray(order), axis=0)
        enc_mask = None
        if encoder_padding_mask is not None:
            enc_mask = jnp.take(jnp.asarray(encoder_padding_mask),
                                jnp.asarray(order), axis=0)
        caches = [self.decoder.init_cache(p, enc, max_len + 2,
                                          encoder_padding_mask=enc_mask)
                  for p in members]

        tokens = np.full((bsz * beam, max_len + 2), self.pad, np.int32)
        tokens[:, 0] = bos
        scores = np.zeros((bsz * beam, max_len + 1), np.float32)
        cands_to_ignore = np.zeros((bsz, beam), bool)
        finalized = [[] for _ in range(bsz)]
        finished = [False] * bsz

        # fast path: LM fusion, prefix forcing and ensembles need the full
        # lprobs on the host; the common single-model case keeps candidate
        # selection on device. The vocab guard keeps every one of the
        # 2*beam device candidates FINITE even with pad (and possibly
        # eos) masked to -inf — top_k tie order among -inf rows is what
        # the host path's min(k, vocab-1) clip avoids, so require
        # vocab-2 >= 2*beam (one stricter than the host's vocab-1 clip,
        # conservatively safe).
        fast = (self.lm is None and prefix_tokens is None
                and len(members) == 1
                and self.vocab_size - 2 >= 2 * beam)
        reorder = None
        for step in range(max_len + 1):
            if reorder is not None:
                caches = [self.decoder.reorder_cache(c, jnp.asarray(reorder))
                          for c in caches]
            if fast:
                cum = (scores[:, step - 1] if step > 0
                       else np.zeros(bsz * beam, np.float32))
                packed, caches[0] = self._step_select(
                    members[0], caches[0], jnp.asarray(tokens[:, step]),
                    step, jnp.asarray(cum), max_len)
                packed = np.asarray(packed)  # the ONE d2h of this step
                cand_scores = packed[0].view(np.float32)
                cand_tokens = packed[1]
                cand_beams = packed[2]
            else:
                cand_scores, cand_tokens, cand_beams = \
                    self._host_candidates(members, caches, tokens, scores,
                                          prefix_tokens, step, max_len,
                                          bsz, beam)
            cand_rows = cand_beams + np.arange(bsz)[:, None] * beam

            # finalize EOS candidates that rank in the top `beam`
            eos_mask = (cand_tokens == self.eos) & (cand_scores != -np.inf)
            eos_mask[:, :beam][cands_to_ignore] = False
            for sent in range(bsz):
                if finished[sent]:
                    continue
                for j in range(beam):
                    if not eos_mask[sent, j]:
                        continue
                    row = cand_rows[sent, j]
                    eos_score = cand_scores[sent, j]
                    hyp = tokens[row, 1: step + 2].copy()
                    hyp[step] = self.eos
                    pos = scores[row, : step + 1].copy()
                    pos[step] = eos_score
                    pos[1:] -= pos[:-1].copy()
                    final = eos_score
                    if self.normalize_scores:
                        final = eos_score / (step + 1) ** self.len_penalty
                    if len(finalized[sent]) < beam:
                        finalized[sent].append({
                            "tokens": hyp, "score": float(final),
                            "positional_scores": pos})
                if len(finalized[sent]) == beam or step == max_len:
                    finished[sent] = True
            if all(finished):
                break

            # fairseq's active_mask trick: penalize EOS'd / ignored slots,
            # keep the `beam` smallest (i.e. best remaining candidates)
            cand_size = cand_scores.shape[1]
            eos_mask[:, :beam] |= cands_to_ignore
            active_mask = (eos_mask.astype(np.int64) * cand_size
                           + np.arange(cand_size)[None])
            active_hypos = np.argsort(active_mask, axis=1,
                                      kind="stable")[:, :beam]
            new_ignore = np.take_along_axis(active_mask, active_hypos,
                                            axis=1) >= cand_size
            cands_to_ignore = new_ignore
            active_rows = np.take_along_axis(cand_rows, active_hypos, axis=1)
            active_scores = np.take_along_axis(cand_scores, active_hypos,
                                               axis=1)
            active_tokens = np.take_along_axis(cand_tokens, active_hypos,
                                               axis=1)

            reorder = active_rows.reshape(-1)
            tokens[:, : step + 1] = tokens[reorder, : step + 1]
            tokens[:, step + 1] = active_tokens.reshape(-1)
            if step > 0:
                scores[:, :step] = scores[reorder, :step]
            scores[:, step] = active_scores.reshape(-1)

        for sent in range(bsz):
            finalized[sent].sort(key=lambda h: -h["score"])
        return finalized

    # ------------------------------------------------------------------

    def _build_device_search(self):
        """ONE jitted program for the WHOLE beam search: every per-step
        structure above (candidate ranking, top-beam EOS finalization,
        the active_mask survivor trick, cache reorder) runs inside a
        ``lax.while_loop`` on device, so a decode costs a single dispatch
        and a single d2h fetch per utterance batch — the TPU-native
        serving path (the per-step host loop pays one link round-trip per
        token, which through a relayed link dominates end-to-end decode
        latency). Finalized slots come back as fixed-shape buffers the
        host trims with ``n_fin``/``fin_len``."""
        beam, pad, unk, eos = (self.beam_size, self.pad, self.unk, self.eos)
        decoder = self.decoder
        neg_inf = jnp.float32(-jnp.inf)

        def search(params, enc, enc_mask, bos, max_len):
            bsz = enc.shape[0]
            R, L, ML1 = bsz * beam, max_len + 2, max_len + 1
            order = jnp.repeat(jnp.arange(bsz), beam)
            enc_b = jnp.take(enc, order, axis=0)
            mask_b = (None if enc_mask is None
                      else jnp.take(enc_mask, order, axis=0))
            cache = decoder.init_cache(params, enc_b, L,
                                       encoder_padding_mask=mask_b)
            sent_of = jnp.arange(bsz)[:, None]

            def body(st):
                (step, tokens, scores, cache, ignore, finished, n_fin,
                 fin_tok, fin_scr, fin_raw, fin_len) = st
                cum = jnp.where(step > 0,
                                scores[:, jnp.maximum(step - 1, 0)], 0.0)
                logits, cache = decoder.step(params, cache,
                                             tokens[:, step], step)
                lp = jax.nn.log_softmax(
                    logits.astype(jnp.float32) / self.temperature, axis=-1)
                v = lp.shape[-1]
                col = jnp.arange(v)[None, :]
                lp = jnp.where(jnp.isnan(lp), neg_inf, lp)
                lp = lp.at[:, pad].set(neg_inf)
                lp = lp.at[:, unk].add(-self.unk_penalty)
                lp = jnp.where((step >= max_len) & (col != eos), neg_inf, lp)
                lp = jnp.where((step < self.min_len) & (col == eos),
                               neg_inf, lp)
                flat = (lp + cum[:, None]).reshape(bsz, beam * v)
                beam_ix = jnp.repeat(jnp.arange(beam), v)[None, :]
                flat = jnp.where((step == 0) & (beam_ix > 0), neg_inf, flat)
                cs, idx = jax.lax.top_k(flat, 2 * beam)
                ct, cb = idx % v, idx // v
                cand_rows = cb + sent_of * beam

                # top-beam EOS finalization (host: for j in range(beam))
                eos_cand = (ct == eos) & (cs != neg_inf)
                do_fin = (eos_cand[:, :beam] & ~ignore
                          & ~finished[:, None])
                slot = n_fin[:, None] + jnp.cumsum(do_fin, axis=1) - 1
                accept = do_fin & (slot < beam)
                rows = cand_rows[:, :beam].reshape(-1)
                rows_tok = tokens[rows].reshape(bsz, beam, L)
                rows_tok = jnp.where(jnp.arange(L)[None, None, :]
                                     == step + 1, eos, rows_tok)
                rows_scr = scores[rows].reshape(bsz, beam, ML1)
                rows_scr = jnp.where(jnp.arange(ML1)[None, None, :] == step,
                                     cs[:, :beam, None], rows_scr)
                final = (cs[:, :beam]
                         / (step + 1.0) ** self.len_penalty
                         if self.normalize_scores else cs[:, :beam])
                onehot = (accept[:, :, None]
                          & (slot[:, :, None]
                             == jnp.arange(beam)[None, None, :]))
                sel = onehot.any(axis=1)
                fin_tok = jnp.where(
                    sel[:, :, None],
                    (onehot[..., None] * rows_tok[:, :, None, :]).sum(1),
                    fin_tok)
                fin_raw = jnp.where(
                    sel[:, :, None],
                    (onehot[..., None] * rows_scr[:, :, None, :]).sum(1),
                    fin_raw)
                fin_scr = jnp.where(sel, (onehot * final[:, :, None]).sum(1),
                                    fin_scr)
                fin_len = jnp.where(sel, step + 1, fin_len)
                n_fin = n_fin + accept.sum(axis=1)
                finished = finished | (n_fin == beam) | (step == max_len)

                # survivors: beam smallest of the eos/ignore-penalized rank
                cand_size = 2 * beam
                eos_pen = eos_cand.at[:, :beam].set(eos_cand[:, :beam]
                                                    | ignore)
                active_mask = (eos_pen.astype(jnp.int32) * cand_size
                               + jnp.arange(cand_size)[None, :])
                active_hypos = jnp.argsort(active_mask, axis=1,
                                           stable=True)[:, :beam]
                ignore = jnp.take_along_axis(active_mask, active_hypos,
                                             axis=1) >= cand_size
                active_rows = jnp.take_along_axis(cand_rows, active_hypos,
                                                  axis=1)
                reorder = active_rows.reshape(-1)
                tokens = jnp.where(
                    jnp.arange(L)[None, :] == step + 1,
                    jnp.take_along_axis(ct, active_hypos,
                                        axis=1).reshape(-1)[:, None],
                    tokens[reorder])
                scores = jnp.where(
                    jnp.arange(ML1)[None, :] == step,
                    jnp.take_along_axis(cs, active_hypos,
                                        axis=1).reshape(-1)[:, None],
                    scores[reorder])
                cache = decoder.reorder_cache(cache, reorder)
                return (step + 1, tokens, scores, cache, ignore, finished,
                        n_fin, fin_tok, fin_scr, fin_raw, fin_len)

            init = (
                jnp.int32(0),
                jnp.full((R, L), pad, jnp.int32).at[:, 0].set(bos),
                jnp.zeros((R, ML1), jnp.float32),
                cache,
                jnp.zeros((bsz, beam), bool),
                jnp.zeros((bsz,), bool),
                jnp.zeros((bsz,), jnp.int32),
                jnp.full((bsz, beam, L), pad, jnp.int32),
                jnp.zeros((bsz, beam), jnp.float32),
                jnp.zeros((bsz, beam, ML1), jnp.float32),
                jnp.zeros((bsz, beam), jnp.int32),
            )
            out = jax.lax.while_loop(
                lambda st: (st[0] <= max_len) & ~st[5].all(), body, init)
            (_, _, _, _, _, _, n_fin, fin_tok, fin_scr, fin_raw,
             fin_len) = out
            return n_fin, fin_tok, fin_scr, fin_raw, fin_len

        return jax.jit(search, static_argnames=("max_len",))

    def generate_on_device(self, params, encoder_out,
                           encoder_padding_mask=None, bos_token=None):
        """``generate()`` with the whole search device-resident (one
        compiled program per (shape, max_len); one d2h per batch). Same
        return contract and — hypothesis-for-hypothesis — the same output
        as the host loop for the single-model case; LM fusion, prefix
        forcing and ensembles stay host-side (``generate``). Matches the
        reference's decode surface (``sequence_generator.py:20``) at
        serving latency the per-step host loop cannot reach off-chip."""
        if self.lm is not None:
            raise ValueError("generate_on_device: LM fusion is host-side; "
                             "use generate()")
        if self.vocab_size - 2 < 2 * self.beam_size:
            raise ValueError("generate_on_device needs vocab-2 >= 2*beam "
                             "(finite top-2*beam under pad/eos masking)")
        if not hasattr(self, "_device_search"):
            self._device_search = self._build_device_search()
        src_len = int(encoder_out.shape[1])
        max_len = min(int(self.max_len_a * src_len + self.max_len_b),
                      self.decoder.cfg.max_target_positions - 1)
        bos = self.eos if bos_token is None else bos_token
        enc_mask = (None if encoder_padding_mask is None
                    else jnp.asarray(encoder_padding_mask))
        n_fin, fin_tok, fin_scr, fin_raw, fin_len = jax.tree_util.tree_map(
            np.asarray,
            self._device_search(params, jnp.asarray(encoder_out), enc_mask,
                                jnp.int32(bos), max_len=max_len))
        finalized = []
        for sent in range(fin_tok.shape[0]):
            hyps = []
            for s in range(int(n_fin[sent])):
                ln = int(fin_len[sent, s])      # hyp length incl. final EOS
                pos = fin_raw[sent, s, :ln].copy()
                pos[1:] -= pos[:-1].copy()
                hyps.append({"tokens": fin_tok[sent, s, 1: ln + 1].copy(),
                             "score": float(fin_scr[sent, s]),
                             "positional_scores": pos})
            hyps.sort(key=lambda h: -h["score"])
            finalized.append(hyps)
        return finalized
