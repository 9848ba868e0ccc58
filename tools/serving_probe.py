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

SWEEP=1 runs the latency frontier instead: chunk_seconds {1, 2, 5} x
batch {8, 32}, per-config p50/p99 cycle and first-note latency (docs/
SERVING.md carries the table + SLO reading). First-note latency for a
note ending in window k is buffering (chunk_seconds, waiting for the
window to fill) + the pump cycle; p50/p99 come from the measured cycle
distribution, which through the tunneled link is weather-dominated —
the probe prints a downlink estimate first so a table from a degraded
window is recognizable.
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
if os.environ.get("TINY") == "1":
    # TINY validates the probe/sweep machinery OFF-chip: force the CPU
    # backend before init so a dead tunnel can't stall the validation run
    # (the config route, not the env var — the axon sitecustomize already
    # set JAX_PLATFORMS before we run)
    jax.config.update("jax_platforms", "cpu")
from svt_speechbrain_tpu.models.wav2vec2 import HuggingFaceWav2Vec2
from svt_speechbrain_tpu.nnet.linear import Linear
from svt_speechbrain_tpu.inference import StreamingServer

B = int(os.environ.get("B", "32"))
ROUNDS = int(os.environ.get("ROUNDS", "4"))
CHUNK_S = float(os.environ.get("CHUNK_S", "5.0"))

# TINY=1: validate the probe/sweep machinery off-chip — on the SAME
# CI-sized architecture as __graft_entry__'s tiny flagship
TINY = os.environ.get("TINY") == "1"
from svt_speechbrain_tpu.models.wav2vec2 import TINY_ARCH, TINY_FEAT_DIM

bridge = HuggingFaceWav2Vec2(source="facebook/wav2vec2-large-lv60",
                             output_norm=True, freeze=True,
                             arch_overrides=dict(TINY_ARCH) if TINY else None)
head = Linear(input_size=TINY_FEAT_DIM if TINY else 1024, n_neurons=20)
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
params = {"wav2vec2": bridge.init(k1), "model": head.init(k2)}
if os.environ.get("INT8"):
    from svt_speechbrain_tpu.models.quantize import quantize_wav2vec2

    params["wav2vec2"] = quantize_wav2vec2(params["wav2vec2"])
    print("int8: encoder FFNs quantized (a8w8)")

def probe_downlink():
    # watchdogged: a dead downlink hangs even a 256 KB fetch; the probe
    # must print ~0 MB/s in that regime, never hang the sweep at line one
    from svt_speechbrain_tpu.utils.linkprobe import probe_downlink_mbps

    probe = jnp.asarray(np.zeros((1 << 16,), np.float32))
    probe.block_until_ready()
    return probe_downlink_mbps(probe, 1 << 18, timeout=60.0)


def run_config(chunk_s, b, rounds, params, quantized):
    """One frontier point: p50/p99 cycle + first-note latency."""
    server = StreamingServer(bridge, head, params, batch_size=b,
                             chunk_seconds=chunk_s, compact="u16")
    sessions = [server.open() for _ in range(b)]
    rng = np.random.default_rng(0)
    wins = [(rng.normal(size=int(chunk_s * 16000)) * 4000).astype(np.int16)
            for _ in range(b)]

    def cycle():
        for sess, w in zip(sessions, wins):
            sess.feed(w)
        assert server.pending == 0

    cycle()  # compile + warm
    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        cycle()
        times.append(time.perf_counter() - t0)
    times = np.sort(times)
    p50 = float(np.percentile(times, 50))
    p99 = float(np.percentile(times, 99))
    return {"chunk_s": chunk_s, "B": b, "int8": quantized,
            "cycle_p50_ms": round(p50 * 1e3, 1),
            "cycle_p99_ms": round(p99 * 1e3, 1),
            "first_note_p50_ms": round((chunk_s + p50) * 1e3, 1),
            "first_note_p99_ms": round((chunk_s + p99) * 1e3, 1),
            "streams_per_chip": round(b * chunk_s / p50, 1)}


def sweep():
    import json

    rounds = int(os.environ.get("ROUNDS", "8"))
    print(f"downlink ~{probe_downlink():.1f} MB/s (link weather context)")
    rows = []
    for chunk_s in (1.0, 2.0, 5.0):
        for b in (8, 32):
            r = run_config(chunk_s, b, rounds, params,
                           bool(os.environ.get("INT8")))
            rows.append(r)
            print(json.dumps(r))
    print()
    print("| chunk (s) | B | cycle p50/p99 (ms) | first-note p50/p99 (ms)"
          " | realtime streams/chip |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['chunk_s']:.0f} | {r['B']} "
              f"| {r['cycle_p50_ms']:.0f} / {r['cycle_p99_ms']:.0f} "
              f"| {r['first_note_p50_ms']:.0f} / {r['first_note_p99_ms']:.0f} "
              f"| {r['streams_per_chip']:.0f} |")


if os.environ.get("SWEEP") == "1":
    sweep()
    sys.exit(0)

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
