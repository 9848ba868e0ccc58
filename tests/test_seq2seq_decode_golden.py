"""Golden parity for the AV-HuBERT seq2seq ASR decode path.

The reference decodes ``hubert_asr`` seq2seq checkpoints through its
vendored fairseq ``TransformerDecoder``
(``speechbrain/lobes/models/decoder.py:38``) and ``SequenceGenerator``
(``speechbrain/lobes/models/sequence_generator.py:20``). These tests prove
our ckpt→decode glue end-to-end against the actual vendored code (fairseq
stubbed with real torch implementations of its decoder modules):

1. converter consumes a fairseq-named ``decoder.*`` state dict and the
   teacher-forced logits match the vendored decoder bit-for-tolerance;
2. our KV-cache incremental step equals our full causal forward;
3. beam decode: our ``FairseqSequenceGenerator`` returns the same token
   sequences and scores as the vendored generator driving the vendored
   decoder, across beam widths, padding masks, penalties and length
   constraints.
"""
from argparse import Namespace

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tests.conftest import reference_available
from tests.reference_harness import (import_reference_seq2seq_decoder,
                                     snapshot_stub_modules,
                                     restore_stub_modules)

from svt_speechbrain_tpu.decoders.fairseq_generator import (
    FairseqSequenceGenerator)
from svt_speechbrain_tpu.models.convert_fairseq import (
    convert_fairseq_seq2seq_decoder)
from svt_speechbrain_tpu.models.seq2seq_decoder import (
    FairseqDecoderConfig, FairseqTransformerDecoder)

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference checkout not present")

V, D, FFN, L, H = 31, 16, 32, 2, 2
PAD, EOS, UNK = 1, 2, 3


@pytest.fixture(scope="module")
def ref_modules():
    saved = snapshot_stub_modules()
    yield import_reference_seq2seq_decoder()
    restore_stub_modules(saved)


def ref_cfg(**over):
    cfg = Namespace(
        decoder_embed_dim=D, decoder_ffn_embed_dim=FFN, decoder_layers=L,
        decoder_attention_heads=H, decoder_normalize_before=True,
        decoder_learned_pos=False, no_token_positional_embeddings=False,
        share_decoder_input_output_embed=False, no_scale_embedding=False,
        decoder_dropout=0.0, decoder_attention_dropout=0.0,
        decoder_activation_dropout=0.0, decoder_layerdrop=0.0,
        max_target_positions=64, activation_fn="relu")
    for k, v in over.items():
        setattr(cfg, k, v)
    return cfg


def our_cfg(rc):
    return FairseqDecoderConfig(
        vocab_size=V, embed_dim=rc.decoder_embed_dim,
        ffn_dim=rc.decoder_ffn_embed_dim, num_layers=rc.decoder_layers,
        num_heads=rc.decoder_attention_heads,
        normalize_before=rc.decoder_normalize_before,
        share_input_output_embed=rc.share_decoder_input_output_embed,
        no_scale_embedding=rc.no_scale_embedding,
        learned_pos=rc.decoder_learned_pos,
        max_target_positions=rc.max_target_positions, padding_idx=PAD,
        activation=rc.activation_fn)


def build_pair(ref_modules, seed=0, **over):
    """(vendored torch decoder, our decoder, converted params)."""
    dec_mod, _, Dictionary = ref_modules
    torch.manual_seed(seed)
    rc = ref_cfg(**over)
    embed = nn.Embedding(V, rc.decoder_embed_dim, padding_idx=PAD)
    ref = dec_mod.TransformerDecoder(rc, Dictionary(V, PAD, EOS, UNK), embed)
    ref.eval()
    sd = {"decoder." + k: v.detach().numpy()
          for k, v in ref.state_dict().items()}
    cfg = our_cfg(rc)
    ours = FairseqTransformerDecoder(cfg)
    params = convert_fairseq_seq2seq_decoder(sd, cfg)
    return ref, ours, params


def rand_enc(seed, b=2, s=5):
    rng = np.random.default_rng(seed)
    enc = rng.normal(size=(b, s, D)).astype(np.float32)
    pm = np.zeros((b, s), bool)
    pm[-1, s - 2:] = True            # last row has padded frames
    return enc, pm


@pytest.mark.parametrize("over", [
    {},                                             # AV-HuBERT defaults
    {"decoder_normalize_before": False},
    {"share_decoder_input_output_embed": True, "no_scale_embedding": True},
    {"decoder_learned_pos": True, "activation_fn": "gelu"},
])
def test_teacher_forced_logits_match_reference(ref_modules, over):
    ref, ours, params = build_pair(ref_modules, **over)
    enc, pm = rand_enc(1)
    prev = np.array([[EOS, 5, 9, 12], [EOS, 7, PAD, PAD]], np.int64)

    enc_t = torch.tensor(enc).transpose(0, 1)       # T x B x C
    with torch.no_grad():
        ref_logits, extra = ref(torch.tensor(prev),
                                encoder_out={"encoder_out": enc_t,
                                             "padding_mask":
                                                 torch.tensor(pm)})
    our_logits, attn = ours(params, jnp.asarray(prev), jnp.asarray(enc),
                            encoder_padding_mask=jnp.asarray(pm))
    np.testing.assert_allclose(np.asarray(our_logits),
                               ref_logits.numpy(), rtol=1e-4, atol=1e-4)
    # the generator reads the head-averaged cross-attention too
    np.testing.assert_allclose(np.asarray(attn),
                               extra["attn"].numpy(), rtol=1e-4, atol=1e-5)


def test_incremental_step_equals_full_forward(ref_modules):
    _, ours, params = build_pair(ref_modules, seed=3)
    enc, pm = rand_enc(4, b=3, s=6)
    prev = np.array([[EOS, 4, 9, 12, 6], [EOS, 7, 5, 5, 8],
                     [EOS, 30, 22, 17, 11]], np.int64)
    full, _ = ours(params, jnp.asarray(prev), jnp.asarray(enc),
                   encoder_padding_mask=jnp.asarray(pm))
    cache = ours.init_cache(params, jnp.asarray(enc), max_len=prev.shape[1],
                            encoder_padding_mask=jnp.asarray(pm))
    for t in range(prev.shape[1]):
        step, cache = ours.step(params, cache, jnp.asarray(prev[:, t]), t)
        np.testing.assert_allclose(np.asarray(step),
                                   np.asarray(full[:, t]), rtol=1e-5,
                                   atol=1e-5)


class _FakeEncoder(nn.Module):
    """HubertEncoderWrapper surface (``hubert_asr.py:369``): fixed features,
    fairseq encoder_out dict, index_select reorder."""

    def __init__(self, enc, pm):
        super().__init__()
        self.enc, self.pm = enc, pm

    def forward_torchscript(self, net_input):
        return {"encoder_out": self.enc.transpose(0, 1),
                "encoder_padding_mask": self.pm, "padding_mask": self.pm}

    def reorder_encoder_out(self, encoder_out, new_order):
        return {
            "encoder_out": encoder_out["encoder_out"].index_select(
                1, new_order),
            "encoder_padding_mask":
                encoder_out["encoder_padding_mask"].index_select(
                    0, new_order),
            "padding_mask": encoder_out["padding_mask"].index_select(
                0, new_order),
        }


class _NonIncrementalView:
    """Runs the vendored decoder full-prefix each step, keeping the
    generator off the incremental path the stub does not implement."""

    def __init__(self, dec):
        self._dec = dec

    def forward(self, tokens, encoder_out=None):
        return self._dec.forward(tokens, encoder_out=encoder_out)


class _RefSeq2Seq(nn.Module):
    def __init__(self, ref_dec, enc, pm):
        super().__init__()
        self.encoder = _FakeEncoder(enc, pm)
        self.decoder = _NonIncrementalView(ref_dec)

    def get_normalized_probs(self, decoder_out, log_probs, sample=None):
        assert log_probs
        return F.log_softmax(decoder_out[0], dim=-1)


@pytest.mark.parametrize("gen_kw", [
    {"beam_size": 1, "max_len_b": 8},
    {"beam_size": 3, "max_len_b": 8},
    {"beam_size": 3, "max_len_b": 8, "len_penalty": 0.5},
    {"beam_size": 2, "max_len_b": 10, "min_len": 3, "unk_penalty": 2.0},
    {"beam_size": 4, "max_len_b": 6, "normalize_scores": False},
])
def test_beam_decode_matches_reference_generator(ref_modules, gen_kw):
    _, gen_mod, Dictionary = ref_modules
    ref, ours, params = build_pair(ref_modules, seed=7)
    enc, pm = rand_enc(8, b=3, s=5)

    model = _RefSeq2Seq(ref, torch.tensor(enc), torch.tensor(pm))
    tgt_dict = Dictionary(V, PAD, EOS, UNK)
    ref_gen = gen_mod.SequenceGenerator([model], tgt_dict, max_len=32,
                                        **gen_kw)
    sample = {"net_input": {
        "source": {"audio": torch.zeros(3, 5), "video": None},
        "padding_mask": torch.tensor(pm)}}
    with torch.no_grad():
        ref_out = ref_gen.generate([model], sample)

    our_gen = FairseqSequenceGenerator(ours, pad=PAD, eos=EOS, unk=UNK,
                                       **gen_kw)
    our_out = our_gen.generate(params, jnp.asarray(enc),
                               encoder_padding_mask=jnp.asarray(pm))

    assert len(ref_out) == len(our_out)
    for sent, (r_hyps, o_hyps) in enumerate(zip(ref_out, our_out)):
        assert len(r_hyps) == len(o_hyps), f"sent {sent}: hyp count"
        for rank, (r, o) in enumerate(zip(r_hyps, o_hyps)):
            assert r["tokens"].tolist() == o["tokens"].tolist(), (
                f"sent {sent} rank {rank}: tokens diverge")
            np.testing.assert_allclose(o["score"], float(r["score"]),
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(
                o["positional_scores"],
                r["positional_scores"].numpy(), rtol=1e-3, atol=1e-4)


def _compare(ref_out, our_out):
    assert len(ref_out) == len(our_out)
    for sent, (r_hyps, o_hyps) in enumerate(zip(ref_out, our_out)):
        assert len(r_hyps) == len(o_hyps), f"sent {sent}: hyp count"
        for rank, (r, o) in enumerate(zip(r_hyps, o_hyps)):
            assert r["tokens"].tolist() == o["tokens"].tolist(), (
                f"sent {sent} rank {rank}: tokens diverge")
            np.testing.assert_allclose(o["score"], float(r["score"]),
                                       rtol=1e-4, atol=1e-5)


def _setup_beam_pair(ref_modules, gen_kw, our_extra=None, ref_extra=None,
                     seed=7):
    _, gen_mod, Dictionary = ref_modules
    ref, ours, params = build_pair(ref_modules, seed=seed)
    enc, pm = rand_enc(8, b=3, s=5)
    model = _RefSeq2Seq(ref, torch.tensor(enc), torch.tensor(pm))
    ref_gen = gen_mod.SequenceGenerator(
        [model], Dictionary(V, PAD, EOS, UNK), max_len=32,
        **gen_kw, **(ref_extra or {}))
    sample = {"net_input": {
        "source": {"audio": torch.zeros(3, 5), "video": None},
        "padding_mask": torch.tensor(pm)}}
    our_gen = FairseqSequenceGenerator(ours, pad=PAD, eos=EOS, unk=UNK,
                                       **gen_kw, **(our_extra or {}))
    return model, ref_gen, sample, our_gen, params, enc, pm


def test_prefix_tokens_match_reference(ref_modules):
    """Forced prefixes incl. ragged lengths (pad = unconstrained)."""
    _, ref_gen, sample, our_gen, params, enc, pm = _setup_beam_pair(
        ref_modules, {"beam_size": 3, "max_len_b": 8})
    prefix = np.array([[5, 9], [7, PAD], [11, 4]], np.int64)
    with torch.no_grad():
        ref_out = ref_gen.generate([ref_gen.model.single_model], sample,
                                   prefix_tokens=torch.tensor(prefix))
    our_out = our_gen.generate(params, jnp.asarray(enc),
                               encoder_padding_mask=jnp.asarray(pm),
                               prefix_tokens=prefix)
    _compare(ref_out, our_out)
    for sent in range(3):  # the forced tokens really are forced
        got = our_out[sent][0]["tokens"][:2].tolist()
        want = [t if t != PAD else got[i]
                for i, t in enumerate(prefix[sent].tolist())]
        assert got == want


class _TorchBigramLM(torch.nn.Module):
    """Shared-weights bigram LM: logits[t] depend only on tokens[t]."""

    def __init__(self, table):
        super().__init__()
        self.table = torch.tensor(table)

    def forward(self, tokens):
        return (self.table[tokens],)

    def get_normalized_probs(self, out, log_probs, sample=None):
        assert log_probs
        return torch.nn.functional.log_softmax(out[0], dim=-1)


def test_lm_fusion_matches_reference(ref_modules):
    """Shallow LM fusion: fairseq adds lm_weight * LOG-probs."""
    table = np.random.default_rng(5).normal(size=(V, V)).astype(np.float32)
    log_table = np.asarray(
        torch.log_softmax(torch.tensor(table), dim=-1))

    def our_lm(tokens_so_far):
        return log_table[tokens_so_far[:, -1]]

    _, ref_gen, sample, our_gen, params, enc, pm = _setup_beam_pair(
        ref_modules, {"beam_size": 3, "max_len_b": 8},
        our_extra={"lm": our_lm, "lm_weight": 0.4},
        ref_extra={"lm_model": _TorchBigramLM(table), "lm_weight": 0.4})
    with torch.no_grad():
        ref_out = ref_gen.generate([ref_gen.model.single_model], sample)
    our_out = our_gen.generate(params, jnp.asarray(enc),
                               encoder_padding_mask=jnp.asarray(pm))
    _compare(ref_out, our_out)


def test_ensemble_matches_reference(ref_modules):
    """Two-member ensemble: logsumexp-averaged log-probs (EnsembleModel)."""
    _, gen_mod, Dictionary = ref_modules
    ref1, ours, params1 = build_pair(ref_modules, seed=11)
    ref2, _, params2 = build_pair(ref_modules, seed=12)
    enc, pm = rand_enc(13, b=2, s=5)
    m1 = _RefSeq2Seq(ref1, torch.tensor(enc), torch.tensor(pm))
    m2 = _RefSeq2Seq(ref2, torch.tensor(enc), torch.tensor(pm))
    ref_gen = gen_mod.SequenceGenerator(
        [m1, m2], Dictionary(V, PAD, EOS, UNK), beam_size=3, max_len_b=8,
        max_len=32)
    sample = {"net_input": {
        "source": {"audio": torch.zeros(2, 5), "video": None},
        "padding_mask": torch.tensor(pm)}}
    with torch.no_grad():
        ref_out = ref_gen.generate([m1, m2], sample)
    our_gen = FairseqSequenceGenerator(ours, beam_size=3, max_len_b=8,
                                       pad=PAD, eos=EOS, unk=UNK)
    our_out = our_gen.generate([params1, params2], jnp.asarray(enc),
                               encoder_padding_mask=jnp.asarray(pm))
    _compare(ref_out, our_out)


def test_device_selection_fast_path_equals_host_path(ref_modules):
    """The on-device top-2k fast path returns exactly what the full-lprobs
    host path returns (a zero LM with weight 0 forces the host path while
    leaving the math untouched)."""
    _, ours, params = build_pair(ref_modules, seed=21)
    enc, pm = rand_enc(22, b=3, s=5)
    kw = dict(beam_size=3, max_len_b=8, min_len=2, unk_penalty=0.5,
              pad=PAD, eos=EOS, unk=UNK)
    fast = FairseqSequenceGenerator(ours, **kw)
    host = FairseqSequenceGenerator(
        ours, lm=lambda toks: np.zeros((toks.shape[0], V), np.float32),
        lm_weight=0.0, **kw)
    a = fast.generate(params, jnp.asarray(enc),
                      encoder_padding_mask=jnp.asarray(pm))
    b = host.generate(params, jnp.asarray(enc),
                      encoder_padding_mask=jnp.asarray(pm))
    for r_hyps, o_hyps in zip(a, b):
        assert len(r_hyps) == len(o_hyps)
        for r, o in zip(r_hyps, o_hyps):
            assert r["tokens"].tolist() == o["tokens"].tolist()
            np.testing.assert_allclose(r["score"], o["score"], rtol=1e-6)


@pytest.mark.parametrize("kw", [
    dict(beam_size=3, max_len_b=8, min_len=2, unk_penalty=0.5),
    dict(beam_size=2, max_len_b=20, min_len=1, normalize_scores=False),
    dict(beam_size=4, max_len_b=12, len_penalty=2.0),
    dict(beam_size=3, max_len_b=3),        # max_len squeezes the search
])
def test_device_resident_search_equals_host_loop(ref_modules, kw):
    """``generate_on_device`` (the WHOLE search in one ``lax.while_loop``
    program, one d2h per batch) returns hypothesis-for-hypothesis what the
    per-step host loop returns — tokens, normalized scores AND positional
    scores — so the TPU-serving decode path inherits the reference-golden
    semantics transitively."""
    _, ours, params = build_pair(ref_modules, seed=31)
    enc, pm = rand_enc(32, b=3, s=5)
    gen = FairseqSequenceGenerator(ours, pad=PAD, eos=EOS, unk=UNK, **kw)
    a = gen.generate(params, jnp.asarray(enc),
                     encoder_padding_mask=jnp.asarray(pm))
    d = gen.generate_on_device(params, jnp.asarray(enc),
                               encoder_padding_mask=jnp.asarray(pm))
    assert len(a) == len(d)
    for a_hyps, d_hyps in zip(a, d):
        assert len(a_hyps) == len(d_hyps) > 0
        for x, y in zip(a_hyps, d_hyps):
            assert x["tokens"].tolist() == y["tokens"].tolist()
            np.testing.assert_allclose(x["score"], y["score"], rtol=1e-5)
            np.testing.assert_allclose(x["positional_scores"],
                                       y["positional_scores"], rtol=1e-4,
                                       atol=1e-5)


def test_device_resident_search_rejects_host_only_features(ref_modules):
    _, ours, params = build_pair(ref_modules, seed=33)
    lm = lambda toks: np.zeros((toks.shape[0], V), np.float32)  # noqa: E731
    gen = FairseqSequenceGenerator(ours, beam_size=3, lm=lm, lm_weight=0.1,
                                   pad=PAD, eos=EOS, unk=UNK)
    enc, pm = rand_enc(34, b=2, s=4)
    with pytest.raises(ValueError, match="host-side"):
        gen.generate_on_device(params, jnp.asarray(enc))
    wide = FairseqSequenceGenerator(ours, beam_size=15, pad=PAD, eos=EOS,
                                    unk=UNK)
    with pytest.raises(ValueError, match="vocab"):
        wide.generate_on_device(params, jnp.asarray(enc))
