"""Int8 serving-path quantization (ops/quant.py, models/quantize.py).

The bf16 path is the parity surface; these tests pin that (a) the int8
dispatch is numerically close to float, (b) the float path is untouched
by the dispatch change, and (c) a quantized encoder forward stays
highly correlated with the float forward, including the exact-lengths
masked-eval path the batched transcriber uses.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svt_speechbrain_tpu.models.quantize import quantize_wav2vec2
from svt_speechbrain_tpu.models.wav2vec2 import (HuggingFaceWav2Vec2,
                                                 Wav2Vec2Config)
from svt_speechbrain_tpu.nnet.attention import MultiheadAttention
from svt_speechbrain_tpu.nnet.linear import Linear
from svt_speechbrain_tpu.ops.quant import (int8_matmul, quantize_activation,
                                           quantize_weight)


def _tiny_cfg(**kw):
    return Wav2Vec2Config(hidden_size=32, num_layers=2, num_heads=4,
                          ffn_size=64, conv_dim=(16,) * 7,
                          num_conv_pos_embeddings=16,
                          num_conv_pos_embedding_groups=4, **kw)


def test_int8_matmul_close_and_jits():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (6, 17, 96))
    w = jax.random.normal(k2, (96, 48)) * 0.3
    w8, s = quantize_weight(w)
    ref = x @ w
    out = jax.jit(int8_matmul)(x, w8, s)
    rel = np.abs(np.asarray(out - ref)).max() / np.asarray(jnp.abs(ref)).std()
    assert rel < 0.08
    # round-trip contracts
    assert w8.dtype == jnp.int8 and s.shape == (48,)
    x8, xs = quantize_activation(x)
    assert np.abs(np.asarray(x8 * xs - x)).max() < np.asarray(xs).max()


def test_quantize_weight_per_channel_scales():
    # one hot column with a huge value must not poison the other columns
    w = jnp.ones((8, 4)).at[:, 2].set(1000.0)
    w8, s = quantize_weight(w)
    assert np.allclose(np.asarray(w8 * s), np.asarray(w), rtol=0.01)


def test_linear_dispatch_quantized_close_float_untouched():
    lin = Linear(n_neurons=24, input_size=40)
    params = lin.init(jax.random.PRNGKey(3))
    x = jax.random.normal(jax.random.PRNGKey(4), (5, 9, 40))
    ref = lin(params, x)
    # float path: bit-identical to a raw matmul (dispatch adds nothing)
    assert np.array_equal(
        np.asarray(ref),
        np.asarray(jnp.matmul(x, params["w"],
                              preferred_element_type=x.dtype) + params["b"]))
    qp = {"w_q8": quantize_weight(params["w"])[0],
          "w_scale": quantize_weight(params["w"])[1], "b": params["b"]}
    out = jax.jit(lambda p, x: lin(p, x))(qp, x)
    rel = np.abs(np.asarray(out - ref)).max() / np.asarray(jnp.abs(ref)).std()
    assert rel < 0.08


def test_mha_quantized_close():
    from svt_speechbrain_tpu.models.quantize import quantize_mha_params

    mha = MultiheadAttention(nhead=4, d_model=32)
    params = mha.init(jax.random.PRNGKey(5))
    x = jax.random.normal(jax.random.PRNGKey(6), (3, 11, 32))
    ref, _ = mha(params, x, x, x)
    out, _ = jax.jit(lambda p, x: mha(p, x, x, x))(quantize_mha_params(params), x)
    rel = np.abs(np.asarray(out - ref)).max() / np.asarray(jnp.abs(ref)).std()
    assert rel < 0.15


@pytest.mark.parametrize("masked_eval", [False, True])
def test_encoder_quantized_forward_correlates(masked_eval):
    model = HuggingFaceWav2Vec2(config=_tiny_cfg())
    params = model.init(jax.random.PRNGKey(0))
    qparams = quantize_wav2vec2(params)
    wav = jax.random.normal(jax.random.PRNGKey(1), (3, 4800)) * 0.1
    kw = {"wav_lens": jnp.array([1.0, 0.7, 0.5])} if masked_eval else {}
    ref = np.asarray(model(params, wav, **kw)).ravel()
    out = np.asarray(model(qparams, wav, **kw)).ravel()
    cos = float(np.dot(ref, out) / (np.linalg.norm(ref) * np.linalg.norm(out)))
    assert cos > 0.995


def test_singing_transcriber_int8_matches_bf16_notes():
    from svt_speechbrain_tpu.pretrained.interfaces import SingingTranscriber

    cfg = _tiny_cfg()
    bridge = HuggingFaceWav2Vec2(config=cfg, output_norm=True)
    head = Linear(input_size=32, n_neurons=20)
    modules = {"wav2vec2": bridge, "model": head}
    hp = {"frame_rate": 49.8, "onset_threshold": 0.4, "offset_threshold": 0.5}
    wav = np.random.default_rng(0).normal(size=32000).astype(np.float32)
    notes = {}
    for mode in (None, "int8"):
        iface = SingingTranscriber(modules=modules, hparams=hp, batch_size=2,
                                   chunk_seconds=1.0, quantize=mode)
        iface.init_params()  # same seed → identical float weights
        notes[mode] = iface.transcribe_batch({"s": wav})["s"]
    assert isinstance(notes["int8"], list) and notes["int8"]
    # the onset/offset frame decisions are thresholded (robust to the int8
    # perturbation); the pitch argmax over an UNTRAINED model's near-uniform
    # logits is legitimately tie-fragile, so require only majority agreement
    times = lambda ns: [(round(n[0], 4), round(n[1], 4)) for n in ns]
    assert times(notes["int8"]) == times(notes[None])
    agree = sum(a[2] == b[2] for a, b in zip(notes["int8"], notes[None]))
    assert agree / len(notes[None]) > 0.7
    with pytest.raises(ValueError):
        SingingTranscriber(modules=modules, hparams=hp, quantize="int4")


def test_mesh_int8_inference_matches_single_device():
    """Quantized serving shards like bf16: int8 weight leaves + f32 scales
    replicate over the data axis and the batch shards; stitched frames are
    identical to the single-device int8 path on the 8-device virtual mesh."""
    from svt_speechbrain_tpu.inference import BatchedAMTTranscriber
    from svt_speechbrain_tpu.parallel import mesh as mesh_lib

    cfg = _tiny_cfg()
    bridge = HuggingFaceWav2Vec2(config=cfg, output_norm=True)
    head = Linear(input_size=32, n_neurons=20)
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    params = {"wav2vec2": quantize_wav2vec2(bridge.init(k1)),
              "model": head.init(k2)}
    songs = {"a": np.random.default_rng(0).normal(
        size=int(2.2 * 16000)).astype(np.float32)}
    single = BatchedAMTTranscriber(bridge, head, params, chunk_seconds=1.0,
                                   batch_size=8, compute_dtype=jnp.float32)
    mesh = mesh_lib.make_mesh(n_devices=8, axis_names=("data",))
    sharded = BatchedAMTTranscriber(bridge, head, params, chunk_seconds=1.0,
                                    batch_size=8, compute_dtype=jnp.float32,
                                    mesh=mesh)
    got_single = single.predict_frames(songs)["a"]
    got_mesh = sharded.predict_frames(songs)["a"]
    np.testing.assert_allclose(got_mesh, got_single, atol=1e-6)


def test_quantize_avhubert_correlates():
    from svt_speechbrain_tpu.models.avhubert import (AVHubertConfig,
                                                     AVHubertModel)
    from svt_speechbrain_tpu.models.quantize import quantize_avhubert

    m = AVHubertModel(AVHubertConfig(
        encoder_layers=2, encoder_embed_dim=32, encoder_ffn_embed_dim=64,
        encoder_attention_heads=4, audio_feat_dim=10,
        modality_fuse="concat", conv_pos=8, conv_pos_groups=2))
    params = m.init(jax.random.PRNGKey(0))
    qparams = quantize_avhubert(params)
    assert "w_q8" in qparams["post_extract_proj"]
    audio = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 10))
    ref, _ = m.extract_finetune(params, m.init_state(), {"audio": audio})
    out, _ = m.extract_finetune(qparams, m.init_state(), {"audio": audio})
    ref, out = np.asarray(ref).ravel(), np.asarray(out).ravel()
    cos = float(np.dot(ref, out) / (np.linalg.norm(ref) * np.linalg.norm(out)))
    assert cos > 0.995


def test_quantize_wavlm_skips_gated_attention():
    model = HuggingFaceWav2Vec2(config=_tiny_cfg(rel_pos_bias=True,
                                                 num_buckets=8,
                                                 max_bucket_distance=16))
    params = model.init(jax.random.PRNGKey(0))
    qparams = quantize_wav2vec2(params)
    attn = qparams["encoder"]["layers"]["0"]["attn"]
    assert "wq" in attn and "wq_q8" not in attn          # attention kept bf16
    assert "w_q8" in qparams["encoder"]["layers"]["0"]["ffn1"]
    wav = jax.random.normal(jax.random.PRNGKey(1), (2, 3200)) * 0.1
    ref = np.asarray(model(params, wav)).ravel()
    out = np.asarray(model(qparams, wav)).ravel()
    cos = float(np.dot(ref, out) / (np.linalg.norm(ref) * np.linalg.norm(out)))
    assert cos > 0.995


def test_singing_transcriber_stream_int8_matches_offline():
    """SingingTranscriber.stream() serves the SAME (quantized) params as the
    offline path: feeding a song in odd pieces emits exactly the offline
    int8 transcriber's notes."""
    from svt_speechbrain_tpu.pretrained.interfaces import SingingTranscriber

    cfg = _tiny_cfg()
    bridge = HuggingFaceWav2Vec2(config=cfg, output_norm=True)
    head = Linear(input_size=32, n_neurons=20)
    modules = {"wav2vec2": bridge, "model": head}
    hp = {"frame_rate": 49.8, "onset_threshold": 0.4, "offset_threshold": 0.5}
    rng = np.random.default_rng(5)
    wav = rng.normal(size=int(2.7 * 16000)).astype(np.float32)

    iface = SingingTranscriber(modules=modules, hparams=hp, batch_size=2,
                               chunk_seconds=1.0, quantize="int8")
    iface.init_params()
    expected = iface.transcribe_batch({"s": wav})["s"]

    stream = iface.stream()
    # the session really serves quantized weights
    assert "w_q8" in str(jax.tree_util.tree_structure(stream._tr.params))
    got, pos = [], 0
    while pos < len(wav):
        step = int(rng.integers(1000, 30000))
        got += stream.feed(wav[pos:pos + step])
        pos += step
    got += stream.flush()
    assert got == expected
    # sessions are independent: a fresh one reproduces the stream
    s2 = iface.stream()
    again = s2.feed(wav) + s2.flush()
    assert again == expected


def test_fused_qmm_matches_xla_path():
    """The fused Pallas kernel (interpret mode on CPU) reproduces the XLA
    quantize-then-dot path across odd M (row padding), 3-D leading axes,
    bf16 inputs, and block-boundary N."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from svt_speechbrain_tpu.ops.quant import (int8_matmul,
                                               int8_matmul_fused,
                                               quantize_weight)

    rng = jax.random.PRNGKey(0)
    for shape, k, n, dtype in [((37,), 256, 128, jnp.float32),
                               ((2, 5), 128, 256, jnp.float32),
                               ((3, 33), 256, 384, jnp.bfloat16)]:
        k1, k2, rng = jax.random.split(rng, 3)
        x = jax.random.normal(k1, shape + (k,), dtype)
        w8, ws = quantize_weight(jax.random.normal(k2, (k, n)))
        a = int8_matmul(x, w8, ws)
        b = int8_matmul_fused(x, w8, ws, interpret=True, block_m=32,
                              block_n=128)
        assert a.dtype == b.dtype == dtype
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-2, atol=2e-2)


def test_fused_qmm_nondividing_block_and_odd_m():
    """Regression: n not divisible by the default block_n must still cover
    every output column (the grid used floor division), and an odd small m
    (batch-1 serving) must get a sublane-aligned padded block."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from svt_speechbrain_tpu.ops.quant import (int8_matmul,
                                               int8_matmul_fused,
                                               quantize_weight)

    for m, k, n in [(16, 128, 640), (249, 128, 256)]:
        kx, kw = jax.random.split(jax.random.PRNGKey(n + m))
        x = jax.random.normal(kx, (m, k))
        w8, ws = quantize_weight(jax.random.normal(kw, (k, n)))
        a = np.asarray(int8_matmul(x, w8, ws))
        b = np.asarray(int8_matmul_fused(x, w8, ws, interpret=True))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
