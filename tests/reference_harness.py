"""Shared harness for stub-importing the reference speechbrain + recipes.

Used by the golden-parity tests (``test_golden_recipe_parity*.py``,
``test_training_trajectory_parity.py``) AND by ``quality_bench.py`` — one
copy, so a dependency newly stubbed for the tests can't silently go
missing from the standing QUALITY artifact (or vice versa).

The reference package needs hyperpyyaml/torchaudio/ruamel/mir_eval, none
of which ship in this image; ``stub_reference_deps`` installs module stubs
(mir_eval's ``evaluate`` routes to our ``utils.transcription_eval``, itself
golden-tested against mir_eval semantics).
"""
import importlib.machinery
import importlib.util
import os
import sys
import types

REFERENCE_ROOT = "/root/reference"

# module names stub_reference_deps may install — callers that restore
# sys.modules afterwards snapshot exactly these (plus the reference's
# top-level "utils" package, which its recipes shadow)
STUBBED_MODULES = ("hyperpyyaml", "torchaudio", "ruamel", "ruamel.yaml",
                   "mir_eval", "mir_eval.transcription", "mir_eval.util")


def stub_module(name, **attrs):
    """Install a module stub with the given attributes."""
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def stub_reference_deps(evaluate_fn=None, stub=stub_module):
    """Stub every dependency of the reference that this image lacks.

    ``evaluate_fn`` overrides ``mir_eval.transcription.evaluate`` (tests
    pass a recording wrapper); default is our transcription_eval.evaluate.
    ``stub`` lets callers wrap stub_module (e.g. to track installs).
    """
    from svt_speechbrain_tpu.utils import transcription_eval

    if evaluate_fn is None:
        evaluate_fn = transcription_eval.evaluate
    stub("hyperpyyaml", load_hyperpyyaml=lambda *a, **k: {},
         resolve_references=lambda *a, **k: None)
    stub("torchaudio", load=None, info=None,
         set_audio_backend=lambda *a, **k: None,
         get_audio_backend=lambda: "soundfile")
    ry = stub("ruamel")
    ry.yaml = stub("ruamel.yaml", YAML=object)
    me = stub("mir_eval")
    me.transcription = stub("mir_eval.transcription", evaluate=evaluate_fn)
    me.util = stub("mir_eval.util",
                   midi_to_hz=transcription_eval.midi_to_hz)


def load_reference_module(path, name):
    """Exec a reference recipe file under ``name`` and return the module."""
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def import_reference_mir_recipe(evaluate_fn=None, stub=stub_module):
    """Stubs + sys.path + import: returns ``(sb, ref_recipe, ref_hi)`` for
    the MIR_ST500 recipe (``train_audio_ssl.py`` + its HF interface).
    Leaves the reference paths on sys.path — callers that need isolation
    remove them afterwards."""
    stub_reference_deps(evaluate_fn, stub)
    for p in (REFERENCE_ROOT, os.path.join(REFERENCE_ROOT, "MIR_ST500")):
        if p not in sys.path:
            sys.path.insert(0, p)
    import speechbrain as sb

    ref_recipe = load_reference_module(
        os.path.join(REFERENCE_ROOT, "MIR_ST500", "train_audio_ssl.py"),
        "_ref_amt_recipe")
    ref_hi = load_reference_module(
        os.path.join(REFERENCE_ROOT, "MIR_ST500",
                     "huggingface_interface.py"),
        "_ref_hf_iface")
    return sb, ref_recipe, ref_hi


def ref_amt_hparams(sb):
    """The hparams dict the reference AMT Brain reads (mirrors
    ``MIR_ST500/hparams/train_audio_ssl.yaml`` loss/metric wiring)."""
    import functools

    def masked(fn, **kw):
        return functools.partial(fn, reduction="mean", allowed_len_diff=3,
                                 label_smoothing=0.0, **kw)

    def stats(fn):
        return functools.partial(
            sb.utils.metric_stats.MetricStats,
            metric=functools.partial(fn, reduction="batch",
                                     allowed_len_diff=3,
                                     label_smoothing=0.0))

    L = sb.nnet.losses
    return dict(
        pitch_octave_num=4, pitch_class_num=12,
        onset_positive_weight=15.0, offset_positive_weight=1.0,
        onset_criterion=masked(L.bce_loss), offset_criterion=masked(L.bce_loss),
        octave_criterion=masked(L.nll_loss), pitch_criterion=masked(L.nll_loss),
        log_softmax=sb.nnet.activations.Softmax(apply_log=True),
        onset_threshold=0.4, offset_threshold=0.5, frame_rate=49.8,
        onset_tolerance=0.05, pitch_tolerance=50,
        onset_stats=stats(L.bce_loss), offset_stats=stats(L.bce_loss),
        octave_stats=stats(L.nll_loss), pitch_stats=stats(L.nll_loss),
    )


class RefBatch:
    """Duck-typed PaddedBatch for driving the reference Brain directly."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def to(self, device):
        return self


# ---------------------------------------------------------------------------
# fairseq-stubbed import of the vendored AV-HuBERT (video family)
# ---------------------------------------------------------------------------

VIDEO_DIR = os.path.join(REFERENCE_ROOT, "N20EMv2", "video_only")

# modules install_fairseq_stub installs / importing hubert.py pollutes —
# callers that need isolation snapshot these
FAIRSEQ_STUB_MODULES = (
    "fairseq", "fairseq.utils", "fairseq.metrics", "fairseq.search",
    "fairseq.checkpoint_utils", "fairseq.tasks", "fairseq.tasks.fairseq_task",
    "fairseq.data", "fairseq.data.encoders", "fairseq.data.data_utils",
    "fairseq.data.dictionary", "fairseq.dataclass",
    "fairseq.dataclass.configs", "fairseq.dataclass.utils",
    "fairseq.models", "fairseq.models.wav2vec",
    "fairseq.models.wav2vec.wav2vec2", "fairseq.models.hubert",
    "fairseq.models.hubert.hubert", "fairseq.modules",
    "fairseq.data.fairseq_dataset", "fairseq.ngram_repeat_block",
    "omegaconf", "cv2", "python_speech_features", "scipy.io.wavfile",
    "utils", "resnet", "decoder", "hubert_pretraining", "hubert",
    "hubert_dataset", "sequence_generator")


def snapshot_stub_modules():
    """Snapshot the sys.modules entries ``install_fairseq_stub`` touches."""
    return {k: sys.modules.get(k) for k in FAIRSEQ_STUB_MODULES}


def restore_stub_modules(saved):
    """Undo ``install_fairseq_stub``: restore sys.modules AND repair dotted
    entries' parent-package attributes — ``from scipy.io import wavfile``
    resolves via ``getattr(scipy.io, "wavfile")``, which would otherwise
    keep returning the stub after the sys.modules restore."""
    import importlib

    if VIDEO_DIR in sys.path:
        sys.path.remove(VIDEO_DIR)
    for k, v in saved.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v
    for k, v in saved.items():
        parent, _, child = k.rpartition(".")
        if not parent or parent in saved or parent not in sys.modules:
            continue
        if v is not None:
            setattr(sys.modules[parent], child, v)
        elif hasattr(sys.modules[parent], child):
            try:
                setattr(sys.modules[parent], child,
                        importlib.import_module(k))
            except ImportError:
                delattr(sys.modules[parent], child)


def install_fairseq_stub(stub=stub_module):
    """Minimal fairseq surface for importing the vendored hubert.py chain
    (hubert.py, hubert_pretraining.py, decoder.py, utils.py, resnet.py).

    The one numerically-substantial stub is ``fairseq.models.wav2vec
    .wav2vec2.TransformerEncoder``, backed by HF transformers'
    ``Wav2Vec2Encoder(StableLayerNorm)`` — the official, independently
    maintained port of exactly that fairseq module.
    """
    import torch
    import torch.nn as nn

    class _GradMultiplyFn(torch.autograd.Function):
        @staticmethod
        def forward(ctx, x, scale):
            ctx.scale = scale
            return x.clone()

        @staticmethod
        def backward(ctx, grad):
            return grad * ctx.scale, None

    class GradMultiply:
        @staticmethod
        def apply(x, scale):
            return _GradMultiplyFn.apply(x, scale)

    def LayerNormFS(dim, eps=1e-5, elementwise_affine=True):
        return nn.LayerNorm(dim, eps=eps,
                            elementwise_affine=elementwise_affine)

    class TransformerEncoder(nn.Module):
        """HF-transformers-backed twin of fairseq's wav2vec2
        TransformerEncoder (modeling_wav2vec2.Wav2Vec2Encoder*)."""

        def __init__(self, cfg):
            super().__init__()
            from transformers import Wav2Vec2Config
            from transformers.models.wav2vec2.modeling_wav2vec2 import (
                Wav2Vec2Encoder, Wav2Vec2EncoderStableLayerNorm)

            hf = Wav2Vec2Config(
                hidden_size=cfg.encoder_embed_dim,
                num_hidden_layers=cfg.encoder_layers,
                num_attention_heads=cfg.encoder_attention_heads,
                intermediate_size=cfg.encoder_ffn_embed_dim,
                hidden_dropout=float(cfg.dropout),
                attention_dropout=float(cfg.attention_dropout),
                activation_dropout=float(cfg.activation_dropout),
                layerdrop=float(cfg.encoder_layerdrop),
                hidden_act=str(cfg.activation_fn),
                num_conv_pos_embeddings=cfg.conv_pos,
                num_conv_pos_embedding_groups=cfg.conv_pos_groups,
                do_stable_layer_norm=bool(cfg.layer_norm_first))
            hf._attn_implementation = "eager"
            klass = (Wav2Vec2EncoderStableLayerNorm if cfg.layer_norm_first
                     else Wav2Vec2Encoder)
            self.hf = klass(hf)

        def forward(self, x, padding_mask=None, layer=None):
            assert layer is None, "layer extraction not used here"
            attn = None
            if padding_mask is not None:
                attn = (~padding_mask).long()
            out = self.hf(x, attention_mask=attn)
            return out[0], []

    class FairseqDataclass:
        pass

    class BaseFairseqModel(nn.Module):
        pass

    class FairseqTask:
        pass

    class FairseqEncoder(nn.Module):
        def __init__(self, dictionary=None):
            super().__init__()

    class FairseqIncrementalDecoder(nn.Module):
        def __init__(self, dictionary=None):
            super().__init__()

    class FairseqEncoderDecoderModel(nn.Module):
        pass

    def _identity_registry(*a, **k):
        def deco(cls):
            return cls
        return deco

    fairseq = stub("fairseq")
    fairseq.utils = stub(
        "fairseq.utils",
        get_available_activation_fns=lambda: ["relu", "gelu", "gelu_fast",
                                              "tanh", "linear"],
        index_put=lambda t, idx, v: t.index_put(idx, v))
    fairseq.metrics = stub("fairseq.metrics")
    fairseq.search = stub("fairseq.search")
    fairseq.checkpoint_utils = stub("fairseq.checkpoint_utils")
    fairseq.tasks = stub("fairseq.tasks",
                         register_task=_identity_registry,
                         FairseqTask=FairseqTask)
    stub("fairseq.tasks.fairseq_task", FairseqTask=FairseqTask)
    data_utils = stub("fairseq.data.data_utils", compute_mask_indices=None,
                      compute_block_mask_1d=None)
    fairseq.data = stub("fairseq.data", Dictionary=object,
                        encoders=stub("fairseq.data.encoders"),
                        data_utils=data_utils)
    stub("fairseq.data.dictionary", Dictionary=object)
    stub("fairseq.data.fairseq_dataset", FairseqDataset=object)
    stub("fairseq.ngram_repeat_block", NGramRepeatBlock=object)
    fairseq.dataclass = stub("fairseq.dataclass",
                             ChoiceEnum=lambda choices: str,
                             FairseqDataclass=FairseqDataclass)
    stub("fairseq.dataclass.configs", FairseqDataclass=FairseqDataclass)
    stub("fairseq.dataclass.utils",
         convert_namespace_to_omegaconf=lambda ns: ns)
    fairseq.models = stub(
        "fairseq.models", BaseFairseqModel=BaseFairseqModel,
        FairseqEncoder=FairseqEncoder,
        FairseqEncoderDecoderModel=FairseqEncoderDecoderModel,
        FairseqIncrementalDecoder=FairseqIncrementalDecoder,
        register_model=_identity_registry)
    stub("fairseq.models.wav2vec")
    stub("fairseq.models.wav2vec.wav2vec2",
         ConvFeatureExtractionModel=None,
         TransformerEncoder=TransformerEncoder)
    stub("fairseq.models.hubert")
    stub("fairseq.models.hubert.hubert",
         MASKING_DISTRIBUTION_CHOICES=str)
    stub("fairseq.modules", GradMultiply=GradMultiply,
         LayerNorm=LayerNormFS,
         PositionalEmbedding=lambda *a, **k: None,
         TransformerDecoderLayer=lambda *a, **k: __import__(
             "torch").nn.Identity())
    stub("omegaconf", II=lambda s: s, MISSING="???",
         open_dict=lambda x: x)
    stub("cv2")
    stub("python_speech_features", logfbank=None)
    stub("scipy.io.wavfile", read=None)


def import_reference_hubert():
    """Install the fairseq stub and import the vendored
    ``N20EMv2/video_only/hubert.py``. Leaves the stub modules and the
    video dir on sys.path — callers that need isolation snapshot
    ``FAIRSEQ_STUB_MODULES`` and restore afterwards."""
    install_fairseq_stub()
    if VIDEO_DIR not in sys.path:
        sys.path.insert(0, VIDEO_DIR)
    for mod in ("utils", "resnet", "hubert_pretraining", "decoder",
                "hubert"):
        sys.modules.pop(mod, None)
    spec = importlib.util.spec_from_file_location(
        "hubert", os.path.join(VIDEO_DIR, "hubert.py"))
    hubert = importlib.util.module_from_spec(spec)
    sys.modules["hubert"] = hubert
    spec.loader.exec_module(hubert)
    return hubert


def import_reference_video_recipe(evaluate_fn=None, stub=stub_module):
    """Stubs + sys.path + import for the video family: returns
    ``(sb, ref_recipe, hubert)`` — the reference speechbrain, the actual
    ``N20EMv2/video_only/train_video_ssl.py`` module, and the vendored
    ``hubert.py`` (fairseq surface stubbed). The video dir is inserted
    FIRST on sys.path so its ``utils.py`` (Compose/AverageMeter/transforms)
    shadows other recipes'."""
    stub_reference_deps(evaluate_fn, stub)
    install_fairseq_stub(stub)
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    hubert = import_reference_hubert()  # puts VIDEO_DIR first on sys.path
    import speechbrain as sb

    ref_recipe = load_reference_module(
        os.path.join(VIDEO_DIR, "train_video_ssl.py"), "_ref_video_recipe")
    return sb, ref_recipe, hubert


def ref_video_hparams(sb):
    """The hparams the reference video AMT Brain reads (mirrors
    ``N20EMv2/video_only/hparams/train_video_ssl.yaml`` loss/metric/decode
    wiring; ``frame_rate`` 50 and COff tolerances are the family deltas)."""
    hp = ref_amt_hparams(sb)
    hp.update(frame_rate=50, offset_tolerance=0.05, linear_prob_epochs=0)
    return hp


_HF2FS = (
    (".hf.pos_conv_embed.conv.", ".pos_conv.0."),
    (".hf.layers.", ".layers."),
    (".attention.k_proj.", ".self_attn.k_proj."),
    (".attention.v_proj.", ".self_attn.v_proj."),
    (".attention.q_proj.", ".self_attn.q_proj."),
    (".attention.out_proj.", ".self_attn.out_proj."),
    (".feed_forward.intermediate_dense.", ".fc1."),
    (".feed_forward.output_dense.", ".fc2."),
    (".hf.layer_norm.", ".layer_norm."),
)


def fairseq_named_state_dict(model):
    """The assembled model's state dict with the HF-encoder-adapter keys
    renamed to canonical fairseq names (what a real av_hubert checkpoint
    contains and what convert_fairseq consumes)."""
    out = {}
    for k, v in model.state_dict().items():
        for a, b in _HF2FS:
            k = k.replace(a, b)
        # post-LN HF layers name the attn LN "layer_norm"
        if ".layers." in k and k.endswith(
                ("layer_norm.weight", "layer_norm.bias")) and \
                ".self_attn_layer_norm." not in k and \
                ".final_layer_norm." not in k and \
                ".encoder.layer_norm." not in k:
            k = k.replace(".layer_norm.", ".self_attn_layer_norm.")
        out[k] = v.detach().numpy().copy()
    return out


def install_fairseq_decoder_stub():
    """Upgrade the fairseq stub (must run AFTER ``install_fairseq_stub``)
    with REAL torch implementations of the decoder-side fairseq modules, so
    the vendored ``speechbrain/lobes/models/decoder.py`` and
    ``sequence_generator.py`` run numerically:

    - ``fairseq.modules.TransformerDecoderLayer`` — fairseq layer semantics
      (q/k/v/out projections with ``head_dim**-0.5`` query scaling, pre- or
      post-norm residual blocks, fc1/fc2 FFN), non-incremental;
    - ``fairseq.modules.PositionalEmbedding`` — fairseq sinusoidal table
      ([sin | cos] concatenated, padding row zeroed, positions offset by
      ``padding_idx + 1``) or learned with the same offset;
    - ``fairseq.search.BeamSearch`` and ``fairseq.utils.fill_with_neg_inf``.

    Returns a ``Dictionary``-like factory for building tgt_dicts.
    """
    import math
    import sys as _sys

    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class _MHA(nn.Module):
        """fairseq MultiheadAttention (eval mode, non-incremental),
        T x B x C convention."""

        def __init__(self, embed_dim, num_heads):
            super().__init__()
            self.embed_dim, self.num_heads = embed_dim, num_heads
            self.head_dim = embed_dim // num_heads
            self.scaling = self.head_dim ** -0.5
            for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
                setattr(self, name, nn.Linear(embed_dim, embed_dim))

        def forward(self, query, key, value, key_padding_mask=None,
                    attn_mask=None, incremental_state=None,
                    need_weights=True, static_kv=False, **kw):
            assert incremental_state is None, "stub is non-incremental"
            t, b, c = query.shape
            h, dh = self.num_heads, self.head_dim
            q = self.q_proj(query) * self.scaling
            k, v = self.k_proj(key), self.v_proj(value)

            def split(x):
                return x.contiguous().view(-1, b * h, dh).transpose(0, 1)

            q, k, v = split(q), split(k), split(v)
            w = torch.bmm(q, k.transpose(1, 2))           # (B*H, Tq, Tk)
            if attn_mask is not None:
                w = w + attn_mask.unsqueeze(0)
            if key_padding_mask is not None:
                w = w.view(b, h, t, -1).masked_fill(
                    key_padding_mask.unsqueeze(1).unsqueeze(2).to(torch.bool),
                    float("-inf")).view(b * h, t, -1)
            w = F.softmax(w, dim=-1)
            out = torch.bmm(w, v).transpose(0, 1).contiguous().view(t, b, c)
            out = self.out_proj(out)
            attn = w.view(b, h, t, -1).mean(dim=1) if need_weights else None
            return out, attn

    class TransformerDecoderLayer(nn.Module):
        def __init__(self, args, no_encoder_attn=False):
            super().__init__()
            d = args.decoder_embed_dim
            heads = args.decoder_attention_heads
            self.self_attn = _MHA(d, heads)
            self.encoder_attn = None if no_encoder_attn else _MHA(d, heads)
            self.self_attn_layer_norm = nn.LayerNorm(d)
            self.encoder_attn_layer_norm = nn.LayerNorm(d)
            self.final_layer_norm = nn.LayerNorm(d)
            self.fc1 = nn.Linear(d, args.decoder_ffn_embed_dim)
            self.fc2 = nn.Linear(args.decoder_ffn_embed_dim, d)
            act = getattr(args, "activation_fn", "relu")
            self.activation_fn = F.relu if act == "relu" else F.gelu
            self.normalize_before = args.decoder_normalize_before

        def forward(self, x, encoder_out=None, encoder_padding_mask=None,
                    incremental_state=None, self_attn_mask=None,
                    self_attn_padding_mask=None, **kw):
            assert incremental_state is None, "stub is non-incremental"
            residual = x
            if self.normalize_before:
                x = self.self_attn_layer_norm(x)
            x, _ = self.self_attn(x, x, x, attn_mask=self_attn_mask,
                                  key_padding_mask=self_attn_padding_mask,
                                  need_weights=False)
            x = residual + x
            if not self.normalize_before:
                x = self.self_attn_layer_norm(x)
            attn = None
            if self.encoder_attn is not None and encoder_out is not None:
                residual = x
                if self.normalize_before:
                    x = self.encoder_attn_layer_norm(x)
                x, attn = self.encoder_attn(
                    x, encoder_out, encoder_out,
                    key_padding_mask=encoder_padding_mask, need_weights=True)
                x = residual + x
                if not self.normalize_before:
                    x = self.encoder_attn_layer_norm(x)
            residual = x
            if self.normalize_before:
                x = self.final_layer_norm(x)
            x = self.fc2(self.activation_fn(self.fc1(x)))
            x = residual + x
            if not self.normalize_before:
                x = self.final_layer_norm(x)
            return x, attn, None

    def make_positions(tensor, padding_idx):
        mask = tensor.ne(padding_idx).int()
        return (torch.cumsum(mask, dim=1).type_as(mask)
                * mask).long() + padding_idx

    def sinusoid_table(num_embeddings, dim, padding_idx):
        half = dim // 2
        emb = math.log(10000) / (half - 1)
        emb = torch.exp(torch.arange(half, dtype=torch.float) * -emb)
        emb = torch.arange(num_embeddings, dtype=torch.float).unsqueeze(1) \
            * emb.unsqueeze(0)
        emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=1)
        if dim % 2 == 1:
            emb = torch.cat([emb, torch.zeros(num_embeddings, 1)], dim=1)
        if padding_idx is not None:
            emb[padding_idx, :] = 0
        return emb

    class SinusoidalPositionalEmbedding(nn.Module):
        def __init__(self, embedding_dim, padding_idx, init_size):
            super().__init__()
            self.embedding_dim = embedding_dim
            self.padding_idx = padding_idx
            self.register_buffer("_float_tensor", torch.FloatTensor(1))
            self.weights = sinusoid_table(init_size, embedding_dim,
                                          padding_idx)

        def forward(self, input, incremental_state=None, **kw):
            assert incremental_state is None, "stub is non-incremental"
            bsz, seq_len = input.shape
            need = self.padding_idx + 1 + seq_len
            if need > self.weights.size(0):
                self.weights = sinusoid_table(need, self.embedding_dim,
                                              self.padding_idx)
            positions = make_positions(input, self.padding_idx)
            return self.weights.index_select(
                0, positions.view(-1)).view(bsz, seq_len, -1).detach()

    class LearnedPositionalEmbedding(nn.Embedding):
        def forward(self, input, incremental_state=None, **kw):
            assert incremental_state is None, "stub is non-incremental"
            return super().forward(make_positions(input, self.padding_idx))

    def PositionalEmbedding(num_embeddings, embedding_dim, padding_idx,
                            learned=False):
        if learned:
            m = LearnedPositionalEmbedding(
                num_embeddings + padding_idx + 1, embedding_dim, padding_idx)
            nn.init.normal_(m.weight, mean=0, std=embedding_dim ** -0.5)
            nn.init.constant_(m.weight[padding_idx], 0)
            return m
        return SinusoidalPositionalEmbedding(
            embedding_dim, padding_idx,
            init_size=num_embeddings + padding_idx + 1)

    class Dictionary:
        """len/pad/unk/eos surface of fairseq.data.Dictionary."""

        def __init__(self, vocab_size, pad=1, eos=2, unk=3):
            self._n, self._pad, self._eos, self._unk = (
                vocab_size, pad, eos, unk)

        def __len__(self):
            return self._n

        def pad(self):
            return self._pad

        def eos(self):
            return self._eos

        def unk(self):
            return self._unk

    class BeamSearch:
        """fairseq.search.BeamSearch — candidate ranking semantics."""

        def __init__(self, tgt_dict):
            self.pad, self.unk, self.eos = (tgt_dict.pad(), tgt_dict.unk(),
                                            tgt_dict.eos())
            self.vocab_size = len(tgt_dict)
            self.stop_on_max_len = False
            self.needs_src_lengths = False
            self.supports_constraints = False

        def init_constraints(self, *a):
            pass

        def prune_sentences(self, *a):
            pass

        def update_constraints(self, *a):
            pass

        def set_src_lengths(self, *a):
            pass

        def step(self, step, lprobs, scores, prev_output_tokens=None,
                 original_batch_idxs=None):
            bsz, beam_size, vocab_size = lprobs.size()
            if step == 0:
                lprobs = lprobs[:, ::beam_size, :].contiguous()
            else:
                lprobs = lprobs + scores[:, :, step - 1].unsqueeze(-1)
            top = torch.topk(
                lprobs.view(bsz, -1),
                k=min(beam_size * 2, lprobs.view(bsz, -1).size(1) - 1))
            scores_buf, indices_buf = top
            beams_buf = torch.div(indices_buf, vocab_size,
                                  rounding_mode="floor")
            indices_buf = indices_buf.fmod(vocab_size)
            return scores_buf, indices_buf, beams_buf

    mods = _sys.modules["fairseq.modules"]
    mods.TransformerDecoderLayer = TransformerDecoderLayer
    mods.PositionalEmbedding = PositionalEmbedding
    _sys.modules["fairseq"].utils.fill_with_neg_inf = (
        lambda t: t.float().fill_(float("-inf")).type_as(t))
    _sys.modules["fairseq.search"].BeamSearch = BeamSearch
    _sys.modules["fairseq"].search.BeamSearch = BeamSearch
    return Dictionary


def import_reference_seq2seq_decoder():
    """Install the upgraded fairseq stub and import the vendored
    ``speechbrain/lobes/models/decoder.py`` + ``sequence_generator.py``
    (the AV-HuBERT seq2seq ASR decode path). Returns
    (decoder_module, generator_module, Dictionary)."""
    install_fairseq_stub()
    Dictionary = install_fairseq_decoder_stub()
    lobes = os.path.join(REFERENCE_ROOT, "speechbrain", "lobes", "models")
    dec = load_reference_module(os.path.join(lobes, "decoder.py"),
                                "_ref_seq2seq_decoder")
    gen = load_reference_module(
        os.path.join(lobes, "sequence_generator.py"), "_ref_seq2seq_gen")
    return dec, gen, Dictionary
