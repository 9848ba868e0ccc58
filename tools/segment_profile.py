"""Per-segment device profile of the flagship AMT forward.

Times each pipeline segment in its own jit'd ``lax.fori_loop`` (device-only,
scalar d2h — link-proof like tools/device_mfu_probe.py) and reports ms/batch,
analytic TFLOP/s, and segment MFU, so the gap between the whole-forward device
MFU (~46% as of round 2) and peak is attributed to a specific op group instead
of guessed at.

Segments:
  frontend      7-layer strided conv extractor (fused Pallas or XLA path)
  proj+posconv  feature-projection LN/Linear + grouped positional conv
  encoder       all transformer layers (and a single-layer probe split into
                attention-only and ffn-only variants)
  head          the 20-class frame head

Env: B (batch, default 192), INNER (loop reps, default 8), FUSED (1/0).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/svt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from svt_speechbrain_tpu.models.wav2vec2 import HuggingFaceWav2Vec2
from svt_speechbrain_tpu.nnet.linear import Linear
from svt_speechbrain_tpu.utils.flops import (
    conv_frontend_flops, peak_flops_per_sec)

B = int(os.environ.get("B", "192"))
# 32 inner reps: the scalar d2h fetch that ends each timed call can cost
# 10-25 ms through a degraded tunnel window; at INNER=8 that adds ~3 ms of
# phantom time to every segment (measured: the 0.9 ms head "took" 3.9 ms)
INNER = int(os.environ.get("INNER", "32"))
FUSED = os.environ.get("FUSED", "1") == "1"
SAMPLES = int(float(os.environ.get("SECONDS", "5")) * 16000)

bridge = HuggingFaceWav2Vec2(source="facebook/wav2vec2-large-lv60",
                             output_norm=True, freeze=True)
cfg = bridge.config
enc = bridge.encoder
head = Linear(input_size=cfg.hidden_size, n_neurons=20)
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
params = {"wav2vec2": bridge.init(k1), "model": head.init(k2)}
params = jax.tree_util.tree_map(
    lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)
ep = params["wav2vec2"]["encoder"]

T = cfg.output_length(SAMPLES)
d, f, L = cfg.hidden_size, cfg.ffn_size, cfg.num_layers

rng = np.random.default_rng(0)
wavs = jnp.asarray(rng.normal(size=(B, SAMPLES)), jnp.bfloat16)
feats = jnp.asarray(rng.normal(size=(B, T, cfg.conv_dim[-1])) * 0.1,
                    jnp.bfloat16)
hidden = jnp.asarray(rng.normal(size=(B, T, d)) * 0.1, jnp.bfloat16)


def timed(name, fn, *args, flops=None):
    """fn(*args) -> array; loop it INNER times inside one jit, time best-of-3."""
    @jax.jit
    def loop(*a):
        def body(i, acc):
            out = fn(*a, jitter=(acc * 0).astype(jnp.bfloat16))
            # FULL reduction — a scalar-slice read lets XLA slice-push
            # through the segment's dots and elide most of a pure-matmul
            # segment's work (measured: a DCE'd matmul "ran" at 2.7x the
            # chip's peak). The sum itself is bandwidth noise.
            return acc + jnp.sum(out).astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, INNER, body, jnp.float32(0.0))

    np.asarray(loop(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(*args))
        best = min(best, time.perf_counter() - t0)
    ms = best / INNER * 1e3
    line = f"{name:<28s} {ms:8.2f} ms/batch"
    if flops is not None:
        tfs = flops / (best / INNER) / 1e12
        line += f"  {tfs:7.1f} TFLOP/s  MFU {tfs * 1e12 / peak_flops_per_sec():.3f}"
    print(line, flush=True)
    return best / INNER


fe = enc.feature_extractor
fe_flops = conv_frontend_flops(cfg, SAMPLES) * B


def run_frontend(p, w, jitter):
    return fe(p, w + jitter, fused=FUSED)


def run_proj_pos(p, x, jitter):
    h = x + jitter
    h = enc.feat_proj_ln(p["feat_proj_ln"], h)
    h = enc.feat_proj(p["feat_proj"], h)
    return h + enc.pos_conv(p["pos_conv"], h)


proj_flops = B * (2.0 * T * cfg.conv_dim[-1] * d
                  + 2.0 * (d / cfg.num_conv_pos_embedding_groups)
                  * cfg.num_conv_pos_embeddings * d * T)


def run_encoder_layers(p, x, jitter):
    h = x + jitter
    for i, layer in enumerate(enc.layers):
        h = layer(p[str(i)], h)
    return h


layer_flops = B * (8.0 * T * d * d + 4.0 * T * T * d + 4.0 * T * d * f)

lyr = enc.layers[0]
lp = ep["layers"]["0"]


def run_attn_only(p, x, jitter):
    h = x + jitter
    return lyr.attn(p["attn"], h, h, h, return_attn_weights=False,
                    impl=cfg.attention_impl)


def run_ffn_only(p, x, jitter):
    from svt_speechbrain_tpu.nnet.activations import fast_gelu
    h = lyr.ffn1(p["ffn1"], x + jitter)
    h = fast_gelu(h)
    return lyr.ffn2(p["ffn2"], h)


def run_ln_resid_only(p, x, jitter):
    h = x + jitter
    return h + lyr.ln1(p["ln1"], h) + lyr.ln2(p["ln2"], h)


def run_head(p, x, jitter):
    return head(p, x + jitter)


def run_full(p, w, jitter):
    feats_ = bridge(p["wav2vec2"], w + jitter)
    return head(p["model"], feats_)


from svt_speechbrain_tpu.utils.flops import amt_forward_flops

print(f"B={B} T={T} samples={SAMPLES} fused_frontend={FUSED} "
      f"peak={peak_flops_per_sec() / 1e12:.0f} TFLOP/s")
t_full = timed("full forward", run_full, params, wavs,
               flops=amt_forward_flops(cfg, SAMPLES) * B)
t_fe = timed("frontend", run_frontend, ep["feature_extractor"], wavs, flops=fe_flops)
t_pp = timed("proj+posconv", run_proj_pos, ep, feats, flops=proj_flops)
t_enc = timed("encoder layers (all)", run_encoder_layers, ep["layers"], hidden,
              flops=layer_flops * L)
t_attn = timed("  one layer: attn only", run_attn_only, lp, hidden,
               flops=B * (8.0 * T * d * d + 4.0 * T * T * d))
t_ffn = timed("  one layer: ffn only", run_ffn_only, lp, hidden,
              flops=B * 4.0 * T * d * f)
t_ln = timed("  one layer: 2xLN+resid", run_ln_resid_only, lp, hidden, flops=None)
t_head = timed("head", run_head, params["model"], hidden, flops=B * 2.0 * T * d * 20)

parts = t_fe + t_pp + t_enc + t_head
print(f"\nsum of segments {parts * 1e3:8.2f} ms vs full {t_full * 1e3:8.2f} ms "
      f"(norm/glue overhead {100 * (t_full - parts) / t_full:+.1f}%)")
print(f"share of full: frontend {100 * t_fe / t_full:.1f}%  "
      f"proj+pos {100 * t_pp / t_full:.1f}%  "
      f"encoder {100 * t_enc / t_full:.1f}%  head {100 * t_head / t_full:.1f}%")
print(f"per-layer split: attn {t_attn * 1e3:.2f} ms  ffn {t_ffn * 1e3:.2f} ms  "
      f"ln+resid {t_ln * 1e3:.2f} ms  "
      f"(L x (attn+ffn) = {L * (t_attn + t_ffn) * 1e3:.1f} ms vs encoder "
      f"{t_enc * 1e3:.1f} ms)")
