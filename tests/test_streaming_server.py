"""Multiplexed streaming server: N concurrent sessions through ONE batched
chunk program must emit, per session, exactly what a dedicated streaming
transcriber (and the offline transcriber) produces for the same audio —
multiplexing costs no accuracy."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.models.wav2vec2 import HuggingFaceWav2Vec2, Wav2Vec2Config
from svt_speechbrain_tpu.nnet.linear import Linear
from svt_speechbrain_tpu.inference import (
    BatchedAMTTranscriber, StreamingAMTTranscriber, StreamingServer)


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


def _songs(seed, n, min_s=0.7, max_s=3.1):
    rng = np.random.default_rng(seed)
    return {
        f"s{i}": rng.normal(
            size=int(rng.uniform(min_s, max_s) * 16000)).astype(np.float32)
        for i in range(n)
    }


def test_server_sessions_match_dedicated_streams(tiny_model):
    """Interleaved feeds in odd piece sizes across 3 concurrent sessions emit
    per-session note streams identical to dedicated batch-1 streaming
    transcribers over the same audio."""
    bridge, head, params = tiny_model
    songs = _songs(11, 3)
    server = StreamingServer(bridge, head, params, batch_size=2,
                             chunk_seconds=1.0, compute_dtype=jnp.float32)
    sessions = {name: server.open(name) for name in songs}
    got = {name: [] for name in songs}
    pos = {name: 0 for name in songs}
    rng = np.random.default_rng(7)
    # round-robin interleaved feeds until every song is exhausted
    while any(pos[n] < len(songs[n]) for n in songs):
        for name, wav in songs.items():
            if pos[name] >= len(wav):
                continue
            step = int(rng.integers(1500, 26000))
            got[name] += sessions[name].feed(wav[pos[name]:pos[name] + step])
            pos[name] += step
    for name in songs:
        got[name] += sessions[name].flush()

    for name, wav in songs.items():
        dedicated = StreamingAMTTranscriber(
            bridge, head, params, chunk_seconds=1.0,
            compute_dtype=jnp.float32)
        want = dedicated.feed(wav) + dedicated.flush()
        assert got[name] == want, name
    assert server.open_sessions == 0


def test_server_matches_offline_transcriber(tiny_model):
    bridge, head, params = tiny_model
    songs = _songs(23, 4)
    offline = BatchedAMTTranscriber(bridge, head, params, chunk_seconds=1.0,
                                    batch_size=4, compute_dtype=jnp.float32)
    want = offline.transcribe(songs, fast=False)

    server = StreamingServer(bridge, head, params, batch_size=4,
                             chunk_seconds=1.0, compute_dtype=jnp.float32)
    for name, wav in songs.items():
        s = server.open(name)
        got = s.feed(wav)
        got += s.feed(np.zeros(0, np.float32))  # empty feed is a no-op
        got += s.flush()
        assert got == want[name], name


def test_auto_pump_runs_full_batches(tiny_model):
    """Queued windows drain in full batches without any explicit pump()."""
    bridge, head, params = tiny_model
    server = StreamingServer(bridge, head, params, batch_size=2,
                             chunk_seconds=1.0, compute_dtype=jnp.float32)
    a, b = server.open(), server.open()
    a.feed(np.zeros(16000, np.float32))     # 1 window queued — below batch
    assert server.pending == 1
    b.feed(np.zeros(16000, np.float32))     # fills the batch → auto-pump
    assert server.pending == 0
    a.feed(np.zeros(3 * 16000, np.float32))  # 3 windows → one auto batch
    assert server.pending == 1               # the odd one waits
    assert server.pump() == 1                # forced partial batch
    assert server.pending == 0
    a.flush(), b.flush()


def test_notes_delivered_exactly_once_via_poll(tiny_model):
    """Another session's auto-pump finalizes my notes: they surface via
    poll()/feed()/flush() exactly once, never dropped or duplicated."""
    bridge, head, params = tiny_model
    rng = np.random.default_rng(3)
    wav = rng.normal(size=int(2.2 * 16000)).astype(np.float32) * 2.0
    server = StreamingServer(bridge, head, params, batch_size=4,
                             chunk_seconds=1.0, compute_dtype=jnp.float32)
    mine, other = server.open("mine"), server.open("other")
    assert mine.feed(wav) == []             # 2 windows queued, no batch yet
    # other's feed brings the queue to 4 → auto-pump finalizes mine's too
    other.feed(rng.normal(size=int(2.0 * 16000)).astype(np.float32))
    early = mine.poll()
    assert mine.poll() == []                # taken exactly once
    rest = mine.flush()
    assert mine.flush() == []               # idempotent
    dedicated = StreamingAMTTranscriber(bridge, head, params,
                                        chunk_seconds=1.0,
                                        compute_dtype=jnp.float32)
    assert early + rest == dedicated.feed(wav) + dedicated.flush()
    other.flush()
    with pytest.raises(RuntimeError):
        mine.feed(np.zeros(100, np.float32))


def test_mixed_dtype_sessions(tiny_model):
    """An int16 session and a float32 session share batches losslessly."""
    bridge, head, params = tiny_model
    rng = np.random.default_rng(5)
    pcm = (rng.normal(size=int(1.7 * 16000)) * 6000).astype(np.int16)
    fwav = rng.normal(size=int(1.3 * 16000)).astype(np.float32)
    server = StreamingServer(bridge, head, params, batch_size=2,
                             chunk_seconds=1.0, compute_dtype=jnp.float32)
    si, sf = server.open("i16"), server.open("f32")
    notes_i = si.feed(pcm)
    notes_f = sf.feed(fwav)
    notes_i += si.flush()
    notes_f += sf.flush()

    for wav, got in ((pcm, notes_i), (fwav, notes_f)):
        dedicated = StreamingAMTTranscriber(
            bridge, head, params, chunk_seconds=1.0,
            compute_dtype=jnp.float32)
        assert got == dedicated.feed(wav) + dedicated.flush()

    # switching dtype mid-window would silently skip the 1/32768 scaling
    s = server.open()
    s.feed(pcm[:3000])
    with pytest.raises(ValueError):
        s.feed(fwav[:3000])
    # but a switch on a window boundary (empty buffer) is fine
    s2 = server.open()
    s2.feed(pcm[:16000])
    s2.feed(fwav[:100])
    s.flush(), s2.flush()


def test_int8_server_matches_int8_stream(tiny_model):
    """The server serves quantized params end to end: per-session output
    equals the dedicated int8 streaming session's."""
    from svt_speechbrain_tpu.models.quantize import quantize_wav2vec2

    bridge, head, params = tiny_model
    qparams = {"wav2vec2": quantize_wav2vec2(params["wav2vec2"]),
               "model": params["model"]}
    rng = np.random.default_rng(9)
    wav = rng.normal(size=int(2.4 * 16000)).astype(np.float32)

    server = StreamingServer(bridge, head, qparams, batch_size=2,
                             chunk_seconds=1.0, compute_dtype=jnp.float32)
    assert "w_q8" in str(jax.tree_util.tree_structure(server._tr.params))
    s = server.open()
    got = s.feed(wav) + s.flush()

    dedicated = StreamingAMTTranscriber(bridge, head, qparams,
                                        chunk_seconds=1.0,
                                        compute_dtype=jnp.float32)
    assert got == dedicated.feed(wav) + dedicated.flush()


def test_pretrained_serve_entry(tiny_model):
    """SingingTranscriber.serve() opens a server on the interface's params
    (int8 when quantize='int8') and transcribes like the offline path."""
    from svt_speechbrain_tpu.pretrained.interfaces import SingingTranscriber

    bridge, head, params = tiny_model
    hp = {"frame_rate": 49.8, "onset_threshold": 0.4, "offset_threshold": 0.5}
    iface = SingingTranscriber(
        modules={"wav2vec2": bridge, "model": head}, hparams=hp,
        batch_size=2, chunk_seconds=1.0, quantize="int8")
    iface.params = params
    rng = np.random.default_rng(13)
    wav = rng.normal(size=int(1.9 * 16000)).astype(np.float32)
    want = iface.transcribe_batch({"s": wav})["s"]

    server = iface.serve(batch_size=2)  # bf16, like transcribe_batch
    assert "w_q8" in str(jax.tree_util.tree_structure(server._tr.params))
    s = server.open()
    assert s.feed(wav) + s.flush() == want

def test_dedicated_stream_dtype_switch_guard(tiny_model):
    """StreamingAMTTranscriber.feed() must reject a mid-window dtype switch
    (int16 -> float32 would silently skip the 1/32768 scaling), matching the
    StreamSession guard."""
    bridge, head, params = tiny_model
    tr = StreamingAMTTranscriber(bridge, head, params, chunk_seconds=1.0,
                                 compute_dtype=jnp.float32)
    tr.feed(np.zeros(1000, np.int16))  # buffered partial window
    with pytest.raises(ValueError, match="dtype switch"):
        tr.feed(np.zeros(1000, np.float32))


def test_empty_feed_is_noop_not_dtype_event():
    """Regression: an empty float array fed mid-int16-window must not
    promote the buffer (or raise) — empty feeds are no-ops."""
    import numpy as np

    from svt_speechbrain_tpu.inference import _append_pcm

    buf = _append_pcm(None, np.ones(100, np.int16))
    buf = _append_pcm(buf, np.zeros(0, np.float32))
    assert buf.dtype == np.int16 and len(buf) == 100
    buf = _append_pcm(buf, np.ones(50, np.int16))
    assert buf.dtype == np.int16 and len(buf) == 150
