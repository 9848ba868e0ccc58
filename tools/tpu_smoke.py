#!/usr/bin/env python3
"""Real-chip smoke drive: exercises every Pallas kernel and the inference
pipeline on the ACTUAL TPU backend.

The test suite forces CPU (tests/conftest.py), where Pallas kernels run in
*interpret mode* — Mosaic-only failures (lane-alignment shape casts,
unsupported reshapes, layout inference) are invisible there and have bitten
before. Run this after touching anything under ``ops/`` or the inference
path:

    timeout 600 python tools/tpu_smoke.py        # full (~4 min)
    timeout 300 python tools/tpu_smoke.py fast   # skip the flagship model

Exits non-zero on the first failure.
"""
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def check(name, fn):
    t0 = time.perf_counter()
    fn()
    print(f"OK  {name}  ({time.perf_counter() - t0:.1f}s)")


def smoke_flash_attention():
    from svt_speechbrain_tpu.ops.flash_attention import (
        flash_attention, _xla_attention)

    rng = np.random.default_rng(0)
    b, h, t, d = 8, 16, 249, 64  # the AMT chunk shape (non-block-multiple T)
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.bfloat16)
               for _ in range(3))
    lens = jnp.asarray([t, t, t, t, 200, 100, 50, 0], jnp.int32)
    got = np.asarray(jax.jit(flash_attention)(q, k, v, lens), np.float32)
    want = np.asarray(jax.jit(
        lambda q, k, v, l: _xla_attention(q, k, v, 1.0 / np.sqrt(d), l))(
            q, k, v, lens), np.float32)
    valid = np.asarray(lens) > 0
    err = np.abs(got[valid] - want[valid]).max()
    assert err < 2e-2, f"flash vs xla mismatch: {err}"
    assert np.isfinite(got).all()


def smoke_flash_attention_backward():
    """Mosaic-compile + numerics of the Pallas backward (dQ and dK/dV
    kernels) against the XLA attention VJP on the real chip."""
    from svt_speechbrain_tpu.ops.flash_attention import (
        flash_attention, _xla_attention)

    rng = np.random.default_rng(1)
    b, h, t, d = 8, 16, 249, 64
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.bfloat16)
               for _ in range(3))
    lens = jnp.asarray([t, t, t, t, 200, 100, 50, 0], jnp.int32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, lens).astype(jnp.float32) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(
            q, k, v, 1.0 / np.sqrt(d), lens).astype(jnp.float32) ** 2)

    gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(q, k, v)
    for name, a, b_ in zip(("dq", "dk", "dv"), gf, gx):
        a = np.asarray(a, np.float32)
        b_ = np.asarray(b_, np.float32)
        assert np.isfinite(a).all(), name
        denom = max(np.abs(b_).max(), 1e-3)
        err = np.abs(a - b_).max() / denom
        assert err < 3e-2, f"flash bwd {name} vs xla vjp: rel {err}"


def smoke_flash_attention_dropout():
    """In-kernel attention dropout on the real chip: fwd + grads vs an
    einsum twin using the IDENTICAL mask (regenerated in XLA from the same
    seed + coordinates). Catches Mosaic lowering of the uint32 hash chain
    and fwd/bwd mask divergence."""
    from svt_speechbrain_tpu.ops.flash_attention import (
        flash_attention, attention_dropout_mask)

    rng = np.random.default_rng(2)
    b, h, t, d = 4, 8, 1536, 64  # whole-song-ish window
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.bfloat16)
               for _ in range(3))
    lens = jnp.asarray([t, 1200, 700, 0], jnp.int32)
    seed, rate = 31337, 0.1

    def ref(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) / np.sqrt(d)
        col = jnp.arange(t)
        s = jnp.where(col[None, None, None, :] < lens[:, None, None, None],
                      s, -1e30)
        w = jax.nn.softmax(s, axis=-1)
        w = jnp.where((lens > 0)[:, None, None, None], w, 0.0)
        w = w * attention_dropout_mask(seed, b, h, t, t, rate)
        return jnp.einsum("bhqk,bhkd->bhqd", w, v.astype(jnp.float32))

    flash = jax.jit(lambda q, k, v: flash_attention(
        q, k, v, lens, dropout_seed=jnp.int32(seed), dropout_rate=rate))
    got = np.asarray(flash(q, k, v), np.float32)
    want = np.asarray(jax.jit(ref)(q, k, v), np.float32)
    err = np.abs(got - want).max()
    assert err < 3e-2, f"flash dropout fwd vs masked einsum: {err}"
    # dropout actually drops: zero-rate output differs
    got0 = np.asarray(jax.jit(lambda q, k, v: flash_attention(
        q, k, v, lens))(q, k, v), np.float32)
    assert np.abs(got - got0).max() > 1e-3

    co = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    gf = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
        flash_attention(q, k, v, lens, dropout_seed=jnp.int32(seed),
                        dropout_rate=rate).astype(jnp.float32) * co),
        argnums=(0, 1, 2)))(q, k, v)
    gx = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(ref(q, k, v) * co),
        argnums=(0, 1, 2)))(q, k, v)
    for name, a, b_ in zip(("dq", "dk", "dv"), gf, gx):
        a = np.asarray(a, np.float32)
        b_ = np.asarray(b_, np.float32)
        assert np.isfinite(a).all(), name
        denom = max(np.abs(b_).max(), 1e-3)
        err = np.abs(a - b_).max() / denom
        assert err < 3e-2, f"flash dropout bwd {name}: rel {err}"


def smoke_flash_attention_short():
    """Short-row grouped-heads kernel at the flagship inference shape —
    the auto-dispatch path for Tk <= SHORT_T_MAX (nnet.attention)."""
    from svt_speechbrain_tpu.ops.flash_attention import (
        flash_attention_short, _xla_attention)

    rng = np.random.default_rng(6)
    b, h, t, d = 8, 16, 249, 64
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.bfloat16)
               for _ in range(3))
    lens = jnp.asarray([t, t, t, t, 200, 100, 50, 0], jnp.int32)
    got = np.asarray(jax.jit(flash_attention_short)(q, k, v, lens),
                     np.float32)
    want = np.asarray(jax.jit(
        lambda q, k, v, l: _xla_attention(q, k, v, 1.0 / np.sqrt(d), l))(
            q, k, v, lens), np.float32)
    valid = np.asarray(lens) > 0
    err = np.abs(got[valid] - want[valid]).max()
    assert err < 2e-2, f"short kernel vs xla mismatch: {err}"
    assert np.isfinite(got).all()
    assert np.abs(got[~valid]).max() == 0.0, "padded rows must emit zeros"


def smoke_conv_frontend():
    from svt_speechbrain_tpu.ops.conv_frontend import (
        fused_conv_frontend, pack_weights, _xla_reference, can_fuse)
    from svt_speechbrain_tpu.models.wav2vec2 import (
        ConvFeatureExtractor, Wav2Vec2Config)

    cfg = Wav2Vec2Config(conv_dim=(512,) * 7)
    fe = ConvFeatureExtractor(cfg)
    params = fe.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.normal(size=(2, 16000)), jnp.float32)
    assert can_fuse(cfg, wav), "512-ch frontend must fuse on TPU"
    got = np.asarray(jax.jit(
        lambda p, w: fused_conv_frontend(p, w))(params, wav))
    want = np.asarray(jax.jit(
        lambda p, w: _xla_reference(p, w, cfg.conv_dim))(params, wav))
    err = np.abs(got - want[:, :got.shape[1]]).max()
    # on-chip both paths run matmuls at the TPU's default (bf16-ish)
    # precision and quantize differently; ~1e-2 over 7 layers of O(1)
    # layer-normed activations is precision noise, not a defect (CPU
    # interpret-mode tests check the math exactly)
    assert err < 6e-2, f"fused vs xla frontend mismatch: {err}"
    # fold-widened layer-0 path: the (g, fold0*C) -> (g*fold0, C) reshape
    # must Mosaic-compile (interpret-mode CPU tests can't prove that)
    for fold0 in (8, 16):
        gotf = np.asarray(jax.jit(
            lambda p, w, f0=fold0: fused_conv_frontend(p, w, fold0=f0))(
            params, wav))
        errf = np.abs(gotf - got).max()
        assert errf < 6e-2, f"fold0={fold0} vs baseline mismatch: {errf}"
    # tiny channel counts must NOT dispatch (Mosaic lane alignment)
    tiny = Wav2Vec2Config(conv_dim=(32,) * 7)
    assert not can_fuse(tiny, wav), "32-ch frontend must fall back"


def smoke_transducer_lattice():
    from svt_speechbrain_tpu.ops.transducer_lattice import (
        transducer_loss_fused, transducer_loss_pallas)
    from svt_speechbrain_tpu.nnet.loss.transducer_loss import transducer_loss

    rng = np.random.default_rng(2)
    b, t, u, v = 4, 64, 16, 32
    logits = jnp.asarray(rng.normal(size=(b, t, u + 1, v)), jnp.float32)
    targets = jnp.asarray(rng.integers(1, v, size=(b, u)), jnp.int32)
    ilens = jnp.asarray([1.0, 48 / t, 1.0, 32 / t], jnp.float32)
    tlens = jnp.asarray([1.0, 8 / u, 12 / u, 1.0], jnp.float32)
    outs = {}
    for name, fn in (("autodiff", transducer_loss),
                     ("fused-scan", transducer_loss_fused),
                     ("fused-pallas", transducer_loss_pallas)):
        f = jax.jit(lambda l, _fn=fn: _fn(l, targets, ilens, tlens, 0,
                                          reduction="batch"))
        outs[name] = np.asarray(f(logits))
        g = np.asarray(jax.jit(jax.grad(
            lambda l, _f=f: _f(l).sum()))(logits))
        assert np.isfinite(g).all(), f"{name}: nonfinite grads"
    for name in ("fused-scan", "fused-pallas"):
        err = np.abs(outs[name] - outs["autodiff"]).max()
        assert err < 1e-2, f"{name} vs autodiff: {err}"


def smoke_fused_qmm():
    """Fused quantize+matmul Pallas kernel (ops/quant.int8_matmul_fused):
    Mosaic compile + parity vs the XLA int8 path at model shapes, incl.
    a non-divisible M (the padded branch)."""
    from svt_speechbrain_tpu.ops.quant import (int8_matmul,
                                               int8_matmul_fused,
                                               quantize_weight)

    interp = jax.default_backend() != "tpu"

    @jax.jit
    def rel_err(x, w8, ws):
        # compare on device; only the scalar crosses the (possibly dead)
        # downlink
        a = int8_matmul(x, w8, ws).astype(jnp.float32)
        b = int8_matmul_fused(x, w8, ws,
                              interpret=interp).astype(jnp.float32)
        return jnp.abs(a - b).max() / jnp.maximum(jnp.abs(a).max(), 1e-6)

    for m, k, n in [(1024, 1024, 4096), (777, 4096, 1024)]:
        kx, kw = jax.random.split(jax.random.PRNGKey(m))
        x = jax.random.normal(kx, (m, k), jnp.bfloat16)
        w8, ws = quantize_weight(jax.random.normal(kw, (k, n)))
        err = float(np.asarray(rel_err(x, w8, ws)))
        assert err < 2e-2, f"fused qmm mismatch: rel {err} at ({m},{k},{n})"


def smoke_inference_pipeline():
    from svt_speechbrain_tpu.models.wav2vec2 import (
        HuggingFaceWav2Vec2, Wav2Vec2Config)
    from svt_speechbrain_tpu.nnet.linear import Linear
    from svt_speechbrain_tpu.inference import (
        BatchedAMTTranscriber, StreamingAMTTranscriber)

    cfg = Wav2Vec2Config(hidden_size=64, num_layers=2, num_heads=4,
                         ffn_size=128, conv_dim=(32,) * 7,
                         num_conv_pos_embeddings=16,
                         num_conv_pos_embedding_groups=4)
    bridge = HuggingFaceWav2Vec2(config=cfg, output_norm=True)
    head = Linear(input_size=64, n_neurons=20)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {"wav2vec2": bridge.init(k1), "model": head.init(k2)}
    rng = np.random.default_rng(3)
    songs = {f"s{i}": (rng.normal(size=int(rng.integers(8000, 60000)))
                       * 3000).astype(np.int16) for i in range(4)}
    tr = BatchedAMTTranscriber(bridge, head, params, chunk_seconds=1.0,
                               batch_size=4, compute_dtype=jnp.float32)
    frames = tr.predict_frames(songs)
    assert set(frames) == set(songs)
    notes = tr.transcribe(songs)
    assert all(off > on for ns in notes.values() for on, off, _ in ns)

    st = StreamingAMTTranscriber(bridge, head, params, chunk_seconds=1.0,
                                 compute_dtype=jnp.float32)
    wav = songs["s0"]
    got = []
    for off in range(0, len(wav), 7000):
        got += st.feed(wav[off:off + 7000])
    got += st.flush()
    want = tr.transcribe({"x": wav}, fast=False)["x"]
    assert len(got) == len(want), (got, want)

    # the pretrained serving API's int8 streaming session (quantized
    # weights through the streaming chunk program, Mosaic-compiled here)
    from svt_speechbrain_tpu.pretrained.interfaces import SingingTranscriber

    iface = SingingTranscriber(
        modules={"wav2vec2": bridge, "model": head},
        hparams={"frame_rate": 49.8, "onset_threshold": 0.4,
                 "offset_threshold": 0.5},
        batch_size=4, chunk_seconds=1.0, quantize="int8")
    iface.params = params
    sess = iface.stream()
    assert "w_q8" in str(jax.tree_util.tree_structure(sess._tr.params))
    wavf = wav.astype(np.float32)
    q_notes = sess.feed(wavf) + sess.flush()
    # exact-equality twin: offline at batch 1 over the SAME quantized params
    # (identical program shapes; the batched iface path differs in bf16
    # matmul tiling, which legitimately flips an untrained model's
    # near-uniform thresholded decisions)
    q_tr = BatchedAMTTranscriber(bridge, head, sess._tr.params,
                                 chunk_seconds=1.0, batch_size=1)
    q_want = q_tr.transcribe({"x": wavf}, fast=False)["x"]
    assert q_notes == q_want, "int8 stream != int8 offline(batch1)"
    assert iface.transcribe_batch({"x": wavf})["x"], "int8 batched path empty"

    # the multiplexed streaming server: 3 concurrent sessions auto-pumped
    # through ONE batch-4 chunk program must match the offline transcriber
    # at the SAME batch size (same executable — rows are independent, so
    # bit-equality holds even under TPU bf16 tiling)
    from svt_speechbrain_tpu.inference import StreamingServer

    songs = {f"v{i}": (wavf * (0.5 + 0.25 * i)).astype(np.float32)
             for i in range(3)}
    server = StreamingServer(bridge, head, params, batch_size=4,
                             chunk_seconds=1.0)
    sessions = {n: server.open(n) for n in songs}
    srv_notes = {}
    for n, w in songs.items():  # interleaved partial feeds
        sessions[n].feed(w[:9000])
    for n, w in songs.items():
        srv_notes[n] = sessions[n].poll() + sessions[n].feed(w[9000:])
    for n in songs:
        srv_notes[n] += sessions[n].flush()
    off4 = BatchedAMTTranscriber(bridge, head, params, chunk_seconds=1.0,
                                 batch_size=4)
    want4 = off4.transcribe(songs, fast=False)
    for n in songs:
        assert srv_notes[n] == want4[n], f"server != offline(batch4): {n}"


def smoke_resample_and_specaugment():
    """The round-3 jitted augmentation ops: the kaldi LinearResample
    (static gather + einsum) and SpecAugment's piecewise-cubic time warp —
    XLA-only, but big-gather lowering on TPU deserves a real-chip check."""
    import numpy as np

    from svt_speechbrain_tpu.models.augment import SpecAugment
    from svt_speechbrain_tpu.processing.speech_augmentation import (
        Resample, SpeedPerturb)

    rng = np.random.default_rng(0)
    wav = jnp.asarray((rng.normal(size=(2, 16000)) * 0.2).astype(np.float32))
    down = jax.jit(lambda w: Resample(16000, 8000)(None, w))(wav)
    up = jax.jit(lambda w: Resample(8000, 16000)(None, w))(down)
    n = min(wav.shape[1], up.shape[1])
    err = float(np.abs(np.asarray(up)[:, 200:n - 200]
                       - np.asarray(wav)[:, 200:n - 200]).mean())
    assert np.isfinite(np.asarray(up)).all()

    sp = SpeedPerturb(orig_freq=16000, speeds=[90, 100, 110])
    out = jax.jit(lambda w, k: sp(None, w, rng=k))(wav, jax.random.PRNGKey(0))
    assert out.shape == wav.shape
    assert np.isfinite(np.asarray(out)).all()

    aug = SpecAugment(time_warp=True, freq_mask_width=(0, 6),
                      time_mask_width=(0, 10))
    feats = jnp.asarray(rng.normal(size=(2, 101, 24)).astype(np.float32))
    masked = jax.jit(lambda x, k: aug(None, x, rng=k))(feats,
                                                       jax.random.PRNGKey(1))
    assert masked.shape == feats.shape
    assert np.isfinite(np.asarray(masked)).all()
    assert (np.asarray(masked) == 0).any()


def smoke_seq2seq_decode():
    """The AV-HuBERT seq2seq beam decoder's on-device fast path (jitted
    incremental step + top-2k candidate selection, ONE packed d2h per
    step) against the full-lprobs host path — XLA-only, but the KV-cache
    dynamic-update/top_k lowering and the packed bitcast transfer deserve
    a real-chip run (CPU goldens cover the math; this covers the chip)."""
    from svt_speechbrain_tpu.decoders.fairseq_generator import (
        FairseqSequenceGenerator)
    from svt_speechbrain_tpu.models.seq2seq_decoder import (
        FairseqDecoderConfig, FairseqTransformerDecoder)

    V, PAD, EOS, UNK = 31, 1, 2, 3
    cfg = FairseqDecoderConfig(
        vocab_size=V, embed_dim=16, ffn_dim=32, num_layers=2, num_heads=2,
        max_target_positions=64, padding_idx=PAD)
    dec = FairseqTransformerDecoder(cfg)
    params = dec.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    enc = jnp.asarray(rng.normal(size=(2, 5, 16)).astype(np.float32))
    kw = dict(beam_size=3, max_len_b=4, min_len=1, pad=PAD, eos=EOS,
              unk=UNK)  # short decode: each step pays a link round-trip
    fast = FairseqSequenceGenerator(dec, **kw)
    # a zero LM with weight 0 forces the host path, math untouched
    host = FairseqSequenceGenerator(
        dec, lm=lambda toks: np.zeros((toks.shape[0], V), np.float32),
        lm_weight=0.0, **kw)
    a = fast.generate(params, enc)
    b = host.generate(params, enc)
    # device-RESIDENT search: the whole loop as one program, one d2h
    c = fast.generate_on_device(params, enc)
    for a_hyps, b_hyps, c_hyps in zip(a, b, c):
        assert len(a_hyps) == len(b_hyps) == len(c_hyps) > 0
        for x, y, z in zip(a_hyps, b_hyps, c_hyps):
            assert x["tokens"].tolist() == y["tokens"].tolist()
            assert x["tokens"].tolist() == z["tokens"].tolist()
            np.testing.assert_allclose(x["score"], y["score"], rtol=1e-4)
            np.testing.assert_allclose(x["score"], z["score"], rtol=1e-4)


def smoke_flagship_forward():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    for arr in out:
        assert np.isfinite(np.asarray(arr, np.float32)).all()


def main():
    fast = len(sys.argv) > 1 and sys.argv[1] == "fast"
    if jax.default_backend() != "tpu":
        print(f"WARNING: backend is {jax.default_backend()}, not tpu — "
              "Pallas kernels will run in interpret mode and this smoke "
              "proves nothing about Mosaic compilation.")
    check("flash attention (lengths-masked, T=249)", smoke_flash_attention)
    check("flash attention BACKWARD (dQ + dK/dV kernels)",
          smoke_flash_attention_backward)
    check("flash attention DROPOUT (in-kernel mask, fwd+bwd)",
          smoke_flash_attention_dropout)
    check("flash attention SHORT (grouped heads, T=249)",
          smoke_flash_attention_short)
    check("fused conv frontend (512ch + 32ch fallback)", smoke_conv_frontend)
    check("transducer lattice (scan + pallas vs autodiff)",
          smoke_transducer_lattice)
    check("fused quant-matmul kernel (a8w8, padded branch)",
          smoke_fused_qmm)
    check("batched + streaming inference pipeline", smoke_inference_pipeline)
    check("resample + speed perturb + specaugment (jitted)",
          smoke_resample_and_specaugment)
    if not fast:
        check("seq2seq beam decode (device fast path == host path)",
              smoke_seq2seq_decode)
        check("flagship wav2vec2-large forward", smoke_flagship_forward)
    print("ALL SMOKE CHECKS PASSED")


if __name__ == "__main__":
    main()
