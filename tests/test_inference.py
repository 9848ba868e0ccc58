"""Batched inference pipeline: stitched frame outputs must match per-chunk
single-utterance evaluation exactly, and the vectorized note decoder must
match the exact one."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.models.wav2vec2 import HuggingFaceWav2Vec2, Wav2Vec2Config
from svt_speechbrain_tpu.nnet.linear import Linear
from svt_speechbrain_tpu.inference import BatchedAMTTranscriber
from svt_speechbrain_tpu.utils.amt import frame2note, frame2note_fast


@pytest.fixture(scope="module")
def tiny_model():
    cfg = Wav2Vec2Config(
        hidden_size=32, num_layers=2, num_heads=4, ffn_size=64,
        conv_dim=(16,) * 7, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4)
    bridge = HuggingFaceWav2Vec2(config=cfg, output_norm=True, normalize_wav=True)
    head = Linear(input_size=32, n_neurons=20)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {"wav2vec2": bridge.init(k1), "model": head.init(k2)}
    return bridge, head, params


def test_batched_matches_single_chunk(tiny_model):
    bridge, head, params = tiny_model
    tr = BatchedAMTTranscriber(bridge, head, params, chunk_seconds=1.0,
                               batch_size=4, compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    songs = {
        "a": rng.normal(size=int(2.5 * 16000)).astype(np.float32),  # 3 chunks
        "b": rng.normal(size=int(1.0 * 16000)).astype(np.float32),  # 1 chunk
    }
    stitched = tr.predict_frames(songs)

    # per-chunk single-item forward (the reference's batch_size=1 eval)
    for name, wav in songs.items():
        expected = []
        cs = tr.chunk_samples
        for i in range(-(-len(wav) // cs)):
            part = wav[i * cs:(i + 1) * cs]
            frames = bridge.config.output_length(len(part))
            padded = np.zeros(cs, np.float32)
            padded[:len(part)] = part
            batch = np.stack([padded] * 4)  # same chunk replicated to batch
            lens = jnp.full((4,), len(part) / cs, jnp.float32)
            out = tr._forward(tr.params, jnp.asarray(batch), lens)
            expected.append(np.asarray(out)[0, :frames])  # packed (F, 4)
        expected = np.concatenate(expected, axis=0)
        np.testing.assert_allclose(stitched[name], expected, atol=1e-6)


def test_int16_feed_matches_float(tiny_model):
    bridge, head, params = tiny_model
    tr = BatchedAMTTranscriber(bridge, head, params, chunk_seconds=1.0,
                               batch_size=2, compute_dtype=jnp.float32)
    rng = np.random.default_rng(1)
    pcm = (rng.normal(size=16000 * 2) * 3000).astype(np.int16)
    out_i = tr.predict_frames({"s": pcm})["s"]
    out_f = tr.predict_frames({"s": pcm.astype(np.float32) / 32768.0})["s"]
    np.testing.assert_allclose(out_i, out_f, atol=1e-5)


def test_u16_compact_mode_close_to_f32(tiny_model):
    """The half-bandwidth uint16 output packing quantizes probabilities to
    1/65535 and keeps indices exact."""
    bridge, head, params = tiny_model
    rng = np.random.default_rng(3)
    songs = {"s": rng.normal(size=int(2.2 * 16000)).astype(np.float32)}
    tr32 = BatchedAMTTranscriber(bridge, head, params, chunk_seconds=1.0,
                                 batch_size=2, compute_dtype=jnp.float32)
    tr16 = BatchedAMTTranscriber(bridge, head, params, chunk_seconds=1.0,
                                 batch_size=2, compute_dtype=jnp.float32,
                                 compact="u16")
    out32 = tr32.predict_frames(songs)["s"]
    out16 = tr16.predict_frames(songs)["s"]
    np.testing.assert_allclose(out16[:, :2], out32[:, :2], atol=0.5 / 65535)
    np.testing.assert_array_equal(out16[:, 2:], out32[:, 2:])


def test_transcribe_returns_notes(tiny_model):
    bridge, head, params = tiny_model
    tr = BatchedAMTTranscriber(bridge, head, params, chunk_seconds=1.0, batch_size=2)
    rng = np.random.default_rng(2)
    notes = tr.transcribe({"s": rng.normal(size=32000).astype(np.float32)})
    assert "s" in notes
    for on, off, midi in notes["s"]:
        assert off > on
        assert 36 <= midi <= 36 + 47


@pytest.mark.parametrize("seed", range(6))
def test_frame2note_fast_matches_exact(seed):
    """On data without vote ties the vectorized decoder is identical."""
    rng = np.random.default_rng(seed)
    n = 600
    # sparse onsets, confident consistent pitch per region → no ties
    onset = (rng.random(n) ** 5)
    offset = rng.random(n) * 0.7
    octave = np.repeat(rng.integers(0, 4, size=n // 20 + 1), 20)[:n]
    cls = np.repeat(rng.integers(0, 12, size=n // 20 + 1), 20)[:n]
    arr = np.stack([onset, offset, octave.astype(float), cls.astype(float)], axis=-1)
    exact = frame2note(arr, 0.4, 0.5)
    fast = frame2note_fast(arr, 0.4, 0.5)
    assert len(exact) == len(fast)
    fs = 1 / 49.8
    pitches = (arr[:, 2] * 12 + arr[:, 3]).astype(int)
    votable = (arr[:, 2] != 4) & (arr[:, 3] != 12)
    for a, b in zip(exact, fast):
        assert abs(a[0] - b[0]) < 1e-9
        assert abs(a[1] - b[1]) < 1e-9
        if a[2] != b[2]:
            # any pitch difference must be a genuine majority-vote tie
            i0, i1 = round(a[0] / fs), round(a[1] / fs)
            seg = pitches[i0:i1][votable[i0:i1]]
            counts = np.bincount(seg, minlength=48)
            assert counts[int(a[2]) - 36] == counts[int(b[2]) - 36] == counts.max()


def test_incremental_frame2note_matches_exact():
    """Streaming decoder emits exactly frame2note(all) over random pieces."""
    from svt_speechbrain_tpu.utils.amt import IncrementalFrame2Note

    rng = np.random.default_rng(7)
    for _ in range(50):
        n = int(rng.integers(0, 80))
        fr = (np.stack([rng.random(n), rng.random(n),
                        rng.integers(0, 5, n).astype(np.float64),
                        rng.integers(0, 13, n).astype(np.float64)], axis=-1)
              if n else np.zeros((0, 4)))
        dec = IncrementalFrame2Note(0.4, 0.5)
        got, pos = [], 0
        while pos < n:
            step = int(rng.integers(1, 9))
            got += dec.feed(fr[pos:pos + step])
            pos += step
        got += dec.flush()
        assert got == frame2note(fr, 0.4, 0.5)


def test_streaming_transcriber_matches_offline(tiny_model):
    """Feeding a song in odd-sized pieces yields exactly the offline
    transcriber's (exact-decode) notes for the same audio."""
    from svt_speechbrain_tpu.inference import StreamingAMTTranscriber

    bridge, head, params = tiny_model
    rng = np.random.default_rng(3)
    wav = rng.normal(size=int(3.4 * 16000)).astype(np.float32)

    offline = BatchedAMTTranscriber(
        bridge, head, params, chunk_seconds=1.0, batch_size=4,
        compute_dtype=jnp.float32, onset_threshold=0.5, offset_threshold=0.5)
    expected = offline.transcribe({"s": wav}, fast=False)["s"]

    stream = StreamingAMTTranscriber(
        bridge, head, params, chunk_seconds=1.0, compute_dtype=jnp.float32,
        onset_threshold=0.5, offset_threshold=0.5)
    got, pos = [], 0
    while pos < len(wav):
        step = int(rng.integers(1000, 30000))
        got += stream.feed(wav[pos:pos + step])
        pos += step
    got += stream.flush()
    assert got == expected


def test_streaming_u16_compact(tiny_model):
    """The streaming wrapper dequantizes u16-packed chunk outputs."""
    bridge, head, params = tiny_model
    from svt_speechbrain_tpu.inference import StreamingAMTTranscriber

    rng = np.random.default_rng(8)
    wav = rng.normal(size=int(2.3 * 16000)).astype(np.float32)
    notes_f32, notes_u16 = [], []
    for compact, out in (("f32", notes_f32), ("u16", notes_u16)):
        st = StreamingAMTTranscriber(bridge, head, params, chunk_seconds=1.0,
                                     compute_dtype=jnp.float32,
                                     compact=compact)
        out += st.feed(wav)
        out += st.flush()
    assert len(notes_f32) == len(notes_u16)
    for a, b in zip(notes_f32, notes_u16):
        assert abs(a[0] - b[0]) < 1e-6 and a[2] == b[2]


def test_song_mode_padding_invariant(tiny_model):
    """chunking="song": one whole-song window per song; the bucketed padded
    batch equals running each song unpadded (exact-lengths masking)."""
    bridge, head, params = tiny_model
    rng = np.random.default_rng(9)
    songs = {"a": rng.normal(size=int(3.3 * 16000)).astype(np.float32),
             "b": rng.normal(size=int(1.1 * 16000)).astype(np.float32)}
    tr = BatchedAMTTranscriber(bridge, head, params, batch_size=2,
                               compute_dtype=jnp.float32, chunking="song",
                               song_bucket_seconds=2.0)
    got = tr.predict_frames(songs)
    for name, wav in songs.items():
        frames = bridge.config.output_length(len(wav))
        assert got[name].shape == (frames, 4)
        # unpadded single-song forward
        out = tr._forward(tr.params, jnp.asarray(wav)[None],
                          jnp.asarray([1.0], jnp.float32))
        want = np.asarray(out)[0, :frames]
        np.testing.assert_allclose(got[name], want, atol=2e-5, rtol=1e-4)


def test_mesh_inference_matches_single_device(tiny_model):
    """The transcriber's mesh mode (batch sharded over "data", params
    replicated) produces IDENTICAL stitched frames to the single-device
    path on this 8-device virtual mesh — the north-star pipeline is
    multi-chip-correct, not just the train step."""
    from svt_speechbrain_tpu.parallel import mesh as mesh_lib

    bridge, head, params = tiny_model
    rng = np.random.default_rng(11)
    songs = {
        "a": rng.normal(size=int(3.3 * 16000)).astype(np.float32),
        "b": rng.normal(size=int(1.0 * 16000)).astype(np.float32),
        "c": (rng.normal(size=int(2.1 * 16000)) * 3000).astype(np.int16),
    }
    single = BatchedAMTTranscriber(bridge, head, params, chunk_seconds=1.0,
                                   batch_size=8, compute_dtype=jnp.float32)
    mesh = mesh_lib.make_mesh(n_devices=8, axis_names=("data",))
    sharded = BatchedAMTTranscriber(bridge, head, params, chunk_seconds=1.0,
                                    batch_size=8, compute_dtype=jnp.float32,
                                    mesh=mesh)
    got_single = single.predict_frames(songs)
    got_mesh = sharded.predict_frames(songs)
    for name in songs:
        assert got_single[name].shape == got_mesh[name].shape
        np.testing.assert_allclose(got_mesh[name], got_single[name],
                                   atol=1e-6)

    # decoded note events identical too
    notes_single = single.transcribe(songs, fast=False)
    notes_mesh = sharded.transcribe(songs, fast=False)
    for name in songs:
        np.testing.assert_allclose(np.asarray(notes_mesh[name]),
                                   np.asarray(notes_single[name]))
