"""LM / tokenizer / pretrainer / hpopt / config-system tests."""
import io
import json
import os

import numpy as np
import pytest


def test_arpa_and_backoff_lm():
    from svt_speechbrain_tpu.lm.arpa import read_arpa
    from svt_speechbrain_tpu.lm.ngram import BackoffNgramLM, ngram_evaluation_details, ngram_perplexity

    arpa = """\
\\data\\
ngram 1=3
ngram 2=2

\\1-grams:
-0.5\ta\t-0.3
-0.7\tb\t-0.2
-1.0\t</s>

\\2-grams:
-0.2\ta b
-0.4\tb </s>

\\end\\
"""
    num, ngrams, backoffs = read_arpa(io.StringIO(arpa))
    assert num == {1: 3, 2: 2}
    lm = BackoffNgramLM(ngrams, backoffs)
    # direct bigram hit
    assert abs(lm.logprob("b", ("a",)) - (-0.2)) < 1e-9
    # backoff: P(a | b) = backoff(b) + P(a)
    assert abs(lm.logprob("a", ("b",)) - (-0.2 + -0.5)) < 1e-9
    from svt_speechbrain_tpu.lm.counting import ngrams_for_evaluation

    sent = list(ngrams_for_evaluation(["a", "b"], 2, predict_first=True))
    details = ngram_evaluation_details([sent], lm)
    assert np.isfinite(details[0]["neglogprob"])
    assert ngram_perplexity(details) > 0


def test_char_word_tokenizers():
    from svt_speechbrain_tpu.tokenizers.sentence_piece import CharTokenizer, WordTokenizer

    ct = CharTokenizer().fit(["hello", "world"])
    ids = ct.encode("hello")
    assert ct.decode(ids) == "hello"
    wt = WordTokenizer().fit(["the quick fox", "lazy dog"])
    assert wt.decode(wt.encode("quick dog")) == "quick dog"


def test_pretrainer_roundtrip(tmp_path):
    import jax

    from svt_speechbrain_tpu.nnet.linear import Linear
    from svt_speechbrain_tpu.utils.checkpoints import PytreeHandle, _save_obj
    from svt_speechbrain_tpu.utils.parameter_transfer import Pretrainer

    lin = Linear(4, 3)
    params = {"v": lin.init(jax.random.PRNGKey(0))}
    src = tmp_path / "source"
    src.mkdir()
    handle = PytreeHandle(get=lambda: params["v"], set=lambda t: params.update(v=t))
    _save_obj(handle, str(src / "model.ckpt"))

    params2 = {"v": lin.init(jax.random.PRNGKey(1))}
    handle2 = PytreeHandle(get=lambda: params2["v"], set=lambda t: params2.update(v=t))
    pre = Pretrainer(collect_in=str(tmp_path / "collected"),
                     loadables={"model": handle2},
                     paths={"model": str(src / "model.ckpt")})
    pre.collect_files()
    pre.load_collected()
    for a, b in zip(jax.tree_util.tree_leaves(params["v"]),
                    jax.tree_util.tree_leaves(params2["v"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hpopt_generic_reporter(capsys):
    import io as _io

    from svt_speechbrain_tpu.utils import hpopt

    out = _io.StringIO()
    ctx = hpopt.HyperparameterOptimizationContext(
        reporter_kwargs={"output": out})
    param_file, run_opts, overrides = ctx.parse_arguments(
        ["params.yaml", "--hpopt", "true", "--hpopt_mode", "generic",
         "--device", "cpu"])
    assert ctx.enabled
    assert param_file == "params.yaml"
    with ctx:
        hpopt.report_result({"objective": 0.42})
    assert json.loads(out.getvalue())["objective"] == 0.42


def test_config_system_features(tmp_path):
    from svt_speechbrain_tpu.config import load_hyperyaml

    yaml_src = """
a: 3
b: !ref <a> * 2
c: !ref results/<a>
lin: !new:svt_speechbrain_tpu.nnet.linear.Linear
   input_size: !ref <a>
   n_neurons: 2
modules:
   lin: !ref <lin>
factory: !name:svt_speechbrain_tpu.nnet.losses.bce_loss
   reduction: batch
"""
    h = load_hyperyaml(yaml_src)
    assert h["b"] == 6
    assert h["c"] == "results/3"
    assert h["lin"].input_size == 3
    assert h["modules"]["lin"] is h["lin"]  # aliasing preserved
    import functools

    assert isinstance(h["factory"], functools.partial)

    with pytest.raises(Exception):
        load_hyperyaml("x: !PLACEHOLDER\n")
    # overridden placeholder is fine
    assert load_hyperyaml("x: !PLACEHOLDER\n", "x: 5")["x"] == 5


def test_singing_transcriber_interface():
    import jax

    from svt_speechbrain_tpu.models.wav2vec2 import HuggingFaceWav2Vec2, Wav2Vec2Config
    from svt_speechbrain_tpu.nnet.linear import Linear
    from svt_speechbrain_tpu.pretrained.interfaces import SingingTranscriber

    cfg = Wav2Vec2Config(hidden_size=32, num_layers=1, num_heads=4, ffn_size=64,
                         conv_dim=(16,) * 7, num_conv_pos_embeddings=16,
                         num_conv_pos_embedding_groups=4)
    bridge = HuggingFaceWav2Vec2(config=cfg, output_norm=True)
    head = Linear(input_size=32, n_neurons=20)
    iface = SingingTranscriber(
        modules={"wav2vec2": bridge, "model": head},
        hparams={"frame_rate": 49.8, "onset_threshold": 0.4, "offset_threshold": 0.5},
        batch_size=2, chunk_seconds=1.0)
    iface.init_params()
    wav = np.random.default_rng(0).normal(size=32000).astype(np.float32)
    notes = iface.transcribe_batch({"s": wav})["s"]
    assert isinstance(notes, list)


def test_categorical_and_ctc_encoders(tmp_path):
    from svt_speechbrain_tpu.dataio.encoder import CategoricalEncoder, CTCTextEncoder

    enc = CategoricalEncoder()
    enc.update_from_iterable(["a", "b", "a", "c"])
    assert len(enc) == 3
    assert enc.decode_ndim([enc.encode_label("b")]) == ["b"]
    enc.add_unk()
    assert enc.encode_label("zzz") == enc.lab2ind["<unk>"]
    path = tmp_path / "labels.txt"
    enc.save(str(path))
    enc2 = CategoricalEncoder()
    enc2.load(str(path))
    assert enc2.lab2ind == enc.lab2ind
    assert enc2.unk_label == "<unk>"

    ctc = CTCTextEncoder()
    ctc.update_from_iterable([["h", "i"]], sequence_input=True)
    ctc.insert_blank(index=0)
    seq = ["<blank>", "h", "h", "<blank>", "i"]
    assert ctc.collapse_labels(seq) == ["h", "i"]


def test_singing_transcriber_stream_full_precision_weights():
    """stream(compute_dtype=float32) must act on the interface's
    full-precision weights, not a tree a previous transcriber already cast
    to bf16 (ADVICE r04: silent f32-over-truncated-weights)."""
    import jax
    import jax.numpy as jnp

    from svt_speechbrain_tpu.models.wav2vec2 import HuggingFaceWav2Vec2, Wav2Vec2Config
    from svt_speechbrain_tpu.nnet.linear import Linear
    from svt_speechbrain_tpu.pretrained.interfaces import SingingTranscriber

    cfg = Wav2Vec2Config(hidden_size=32, num_layers=1, num_heads=4, ffn_size=64,
                         conv_dim=(16,) * 7, num_conv_pos_embeddings=16,
                         num_conv_pos_embedding_groups=4)
    bridge = HuggingFaceWav2Vec2(config=cfg, output_norm=True)
    head = Linear(input_size=32, n_neurons=20)
    iface = SingingTranscriber(
        modules={"wav2vec2": bridge, "model": head},
        hparams={"frame_rate": 49.8, "onset_threshold": 0.4,
                 "offset_threshold": 0.5},
        batch_size=2, chunk_seconds=1.0)
    iface.init_params()
    # trigger the batched transcriber (casts ITS copy to bf16)...
    tr = iface._get_transcriber()
    leaf = jax.tree_util.tree_leaves(tr.params["wav2vec2"])[0]
    assert leaf.dtype == jnp.bfloat16
    # ...then a full-precision stream must see untruncated f32 weights
    stream = iface.stream(compute_dtype=jnp.float32)
    sleaves = jax.tree_util.tree_leaves(stream._tr.params["wav2vec2"])
    ileaves = jax.tree_util.tree_leaves(iface.params["wav2vec2"])
    assert all(s.dtype == jnp.float32 for s in sleaves)
    assert all(np.array_equal(np.asarray(s), np.asarray(i))
               for s, i in zip(sleaves, ileaves))


def test_avhubert_asr_detokenizes_with_spm(tmp_path):
    """The seq2seq decode path composes with the in-image SentencePiece
    backend: AVHubertASR.transcribe(tokenizer=...) returns text."""
    import jax
    import jax.numpy as jnp

    from svt_speechbrain_tpu.models.avhubert import AVHubertConfig
    from svt_speechbrain_tpu.models.avhubert_asr import AVHubertASR
    from svt_speechbrain_tpu.models.seq2seq_decoder import (
        FairseqDecoderConfig)
    from svt_speechbrain_tpu.tokenizers.spm_lite import (
        SentencePieceProcessor, SentencePieceTrainer)

    prefix = str(tmp_path / "toy")
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("\n".join(["la la si do", "do re mi fa sol"] * 4))
    SentencePieceTrainer.train(
        input=str(corpus), model_prefix=prefix, vocab_size=24,
        model_type="unigram")
    sp = SentencePieceProcessor()
    sp.load(prefix + ".model")

    enc_cfg = AVHubertConfig(encoder_layers=1, encoder_embed_dim=16,
                             encoder_ffn_embed_dim=32,
                             encoder_attention_heads=2, audio_feat_dim=8)
    dec_cfg = FairseqDecoderConfig(
        vocab_size=sp.get_piece_size(), embed_dim=16, ffn_dim=32,
        num_layers=1, num_heads=2, normalize_before=False,
        no_scale_embedding=True)
    asr = AVHubertASR(enc_cfg, dec_cfg, beam_size=2, max_len_b=5)
    params, state = asr.init(jax.random.PRNGKey(0))
    texts = asr.transcribe(params, state,
                           audio=jnp.ones((2, 8, 8)), tokenizer=sp)
    assert len(texts) == 2 and all(isinstance(t, str) for t in texts)
