"""AV-HuBERT seq2seq ASR: checkpoint → encode → beam decode, end to end.

The reference builds this path from fairseq pieces: ``AVHubertSeq2Seq``
(``N20EMv2/video_only/hubert_asr.py:406`` — ``HubertEncoderWrapper`` around
the pretrained encoder's ``extract_finetune`` plus the vendored
``TransformerDecoder``) decoded by the vendored ``SequenceGenerator``
(``speechbrain/lobes/models/sequence_generator.py:20``). This module is the
same capability as one object: load a fairseq ``av_hubert_seq2seq``
checkpoint without the fairseq runtime, run the AV encoder once per
utterance (a single jitted program), and beam-decode with the
fairseq-semantics generator over the KV-cache incremental decoder.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.decoders.fairseq_generator import (
    FairseqSequenceGenerator)
from svt_speechbrain_tpu.models.avhubert import AVHubertConfig, AVHubertModel
from svt_speechbrain_tpu.models.seq2seq_decoder import (
    FairseqDecoderConfig, FairseqTransformerDecoder)


class AVHubertASR:
    """Encoder + decoder + generator glue for seq2seq ASR checkpoints.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> from svt_speechbrain_tpu.models.avhubert import AVHubertConfig
    >>> enc_cfg = AVHubertConfig(encoder_layers=1, encoder_embed_dim=16,
    ...     encoder_ffn_embed_dim=32, encoder_attention_heads=2,
    ...     audio_feat_dim=8)
    >>> dec_cfg = FairseqDecoderConfig(vocab_size=13, embed_dim=16,
    ...     ffn_dim=32, num_layers=1, num_heads=2, normalize_before=False,
    ...     no_scale_embedding=True)
    >>> asr = AVHubertASR(enc_cfg, dec_cfg, beam_size=2, max_len_b=6)
    >>> params, state = asr.init(jax.random.PRNGKey(0))
    >>> audio = jnp.ones((2, 10, 8))
    >>> hyps = asr.transcribe(params, state, audio=audio)
    >>> len(hyps), int(hyps[0][0]["tokens"][-1])   # best hyp ends in EOS
    (2, 2)
    """

    def __init__(self, encoder_config=None, decoder_config=None,
                 beam_size=5, **generator_kwargs):
        self.encoder_config = encoder_config or AVHubertConfig.large()
        self.decoder_config = decoder_config or FairseqDecoderConfig(
            vocab_size=1000, embed_dim=1024, ffn_dim=4096, num_layers=6,
            num_heads=8, normalize_before=False, no_scale_embedding=True)
        self.encoder = AVHubertModel(self.encoder_config)
        self.decoder = FairseqTransformerDecoder(self.decoder_config)
        self.generator = FairseqSequenceGenerator(
            self.decoder, beam_size=beam_size, **generator_kwargs)

        @jax.jit
        def _encode(params, state, source):
            feats, _ = self.encoder.extract_finetune(
                params["encoder"], state, source)
            return feats

        self._encode = _encode

    # ------------------------------------------------------------ builders

    def init(self, rng):
        k1, k2 = jax.random.split(rng)
        params = {"encoder": self.encoder.init(k1),
                  "decoder": self.decoder.init(k2)}
        return params, self.encoder.init_state()

    @classmethod
    def from_fairseq(cls, source, encoder_config=None, decoder_config=None,
                     **kwargs):
        """Load an ``av_hubert_seq2seq`` checkpoint: a path to the fairseq
        file or an already-flat state dict. Returns ``(asr, params, state)``
        — the reference does the same load through the fairseq task
        registry (``hubert_asr.py:413-470``)."""
        from svt_speechbrain_tpu.models.convert_fairseq import (
            convert_fairseq_avhubert_asr, load_fairseq_state_dict)

        asr = cls(encoder_config, decoder_config, **kwargs)
        sd = source if hasattr(source, "items") else \
            load_fairseq_state_dict(source)
        enc_p, enc_s, dec_p = convert_fairseq_avhubert_asr(
            sd, asr.encoder_config, asr.decoder_config)
        return asr, {"encoder": enc_p, "decoder": dec_p}, enc_s

    # ------------------------------------------------------------ inference

    def encode(self, params, state, audio=None, video=None):
        """AV features (B, T, D) from either or both modalities
        (a missing one is zero-filled, reference ``hubert.py:688``)."""
        source = {}
        if audio is not None:
            source["audio"] = jnp.asarray(audio)
        if video is not None:
            source["video"] = jnp.asarray(video)
        if not source:
            raise ValueError("need audio and/or video")
        return self._encode(params, state, source)

    def transcribe(self, params, state, audio=None, video=None,
                   frame_lengths=None, tokenizer=None,
                   device_search=False):
        """Beam-decode a batch. Returns per utterance the generator's
        hypothesis list (tokens incl. EOS, score, positional_scores),
        best first. With ``tokenizer`` (anything exposing ``decode_ids``,
        e.g. ``tokenizers.spm_lite.SentencePieceProcessor`` loaded from a
        real SentencePiece ``.model``) returns the best hypothesis per
        utterance detokenized to text instead. ``device_search=True``
        runs the whole beam search device-resident (one program, one d2h
        per batch — the serving path; equality-tested vs the host loop),
        for the single-model no-LM case."""
        enc = self.encode(params, state, audio=audio, video=video)
        enc_mask = None
        if frame_lengths is not None:
            t = enc.shape[1]
            enc_mask = jnp.arange(t)[None] >= \
                jnp.asarray(frame_lengths)[:, None]
        decode = (self.generator.generate_on_device if device_search
                  else self.generator.generate)
        hyps = decode(params["decoder"], enc,
                      encoder_padding_mask=enc_mask)
        if tokenizer is None:
            return hyps
        eos = self.generator.eos
        return [tokenizer.decode_ids(
            [int(t) for t in h[0]["tokens"] if int(t) != eos])
            if h else "" for h in hyps]
