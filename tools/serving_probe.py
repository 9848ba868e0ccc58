"""Multiplexed-serving capacity of one chip: drive the REAL
:class:`~svt_speechbrain_tpu.inference.StreamingServer` path (host feed →
batched chunk program → the one d2h transfer → incremental decode) with B
concurrent sessions each delivering one 5 s window per round, and measure
the round cycle time. A chip sustains ``B * 5s / cycle`` realtime streams at
``cycle`` seconds of added latency per window — the serving-side complement
to bench.py's offline throughput (the reference has no serving story at
all: its eval is offline batch-1, ``MIR_ST500/train_audio_ssl.py:84-141``).

Knobs: B (sessions per batch, default 32), ROUNDS (timed rounds, default 4),
INT8 (a8w8 FFNs), COMPACT (u16 halves the downlink bytes).
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/svt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
from svt_speechbrain_tpu.models.wav2vec2 import HuggingFaceWav2Vec2
from svt_speechbrain_tpu.nnet.linear import Linear
from svt_speechbrain_tpu.inference import StreamingServer

B = int(os.environ.get("B", "32"))
ROUNDS = int(os.environ.get("ROUNDS", "4"))
CHUNK_S = 5.0

bridge = HuggingFaceWav2Vec2(source="facebook/wav2vec2-large-lv60",
                             output_norm=True, freeze=True)
head = Linear(input_size=1024, n_neurons=20)
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
params = {"wav2vec2": bridge.init(k1), "model": head.init(k2)}
if os.environ.get("INT8"):
    from svt_speechbrain_tpu.models.quantize import quantize_wav2vec2

    params["wav2vec2"] = quantize_wav2vec2(params["wav2vec2"])
    print("int8: encoder FFNs quantized (a8w8)")

server = StreamingServer(
    bridge, head, params, batch_size=B, chunk_seconds=CHUNK_S,
    compact="u16" if os.environ.get("COMPACT", "u16") == "u16" else "f32")
sessions = [server.open() for _ in range(B)]

rng = np.random.default_rng(0)
# int16 PCM windows, like a realtime caller would send (half the link bytes)
windows = [(rng.normal(size=int(CHUNK_S * 16000)) * 4000).astype(np.int16)
           for _ in range(B)]

def round_trip():
    # each session delivers one window; the Bth feed fills the batch and
    # auto-pumps: upload + chunk program + the one d2h + incremental decode
    for s, w in zip(sessions, windows):
        s.feed(w)
    assert server.pending == 0  # the auto-pump really ran

round_trip()  # compile + warm
best = float("inf")
for _ in range(ROUNDS):
    t0 = time.perf_counter()
    round_trip()
    best = min(best, time.perf_counter() - t0)

streams = B * CHUNK_S / best
print(f"serving: B={B} cycle {best*1e3:.1f} ms  "
      f"sustains {streams:.0f} realtime streams/chip  "
      f"added latency/window {best*1e3:.0f} ms")
