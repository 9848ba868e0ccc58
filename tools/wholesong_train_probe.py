#!/usr/bin/env python3
"""Whole-song TRAINING probe on the real chip: one v5e, one song window.

Measures audio-seconds-trained per wall-clock second AND the MFU of the
step, with remat-aware FLOPs accounting (utils/flops.py):

  * model MFU      — required FLOPs only (fwd + bwd = 3x fwd): the honest
                     utilization number, recompute is overhead;
  * hardware util  — counts remat recompute as useful work (4x fwd with
                     per-layer remat; + another frontend fwd with
                     remat_frontend): how busy the MXU actually is.

Flash attention now applies attention dropout IN-KERNEL, so the probe keeps
the finetune config's dropout (reference regularization semantics) on the
fused path.

Round-3 measurements (240 s audio, one v5e, dropout ON): step 2.35 s →
102.2 audio-sec/s, model MFU 0.148, hardware util 0.197. Why it can't go
much higher: at T≈12k the attention core (4·T²·d) is ~2/3 of the model's
FLOPs and runs on the structurally small-K (D=64) MXU path (docs/PERF.md);
and the per-layer remat is LOAD-BEARING FOR COMPILE TIME, not just memory —
the un-remat'd whole-song backward did not finish XLA compilation in 20
minutes (vs ~10 min with remat), so "drop remat, save the 22.8 TFLOP
recompute" is not available. Expect first-run compiles of ~10 min; the
persistent cache makes reruns fast.

Usage: python tools/wholesong_train_probe.py [seconds] [--no-dropout]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.models.wav2vec2 import HuggingFaceWav2Vec2
from svt_speechbrain_tpu.nnet.linear import Linear
from svt_speechbrain_tpu.nnet import losses
from svt_speechbrain_tpu.utils import flops as flops_util

seconds = int(sys.argv[1]) if len(sys.argv) > 1 else 240
dropout = "--no-dropout" not in sys.argv
samples = seconds * 16000

bridge = HuggingFaceWav2Vec2(source="facebook/wav2vec2-large-lv60",
                             output_norm=True)
bridge.config.remat = True
bridge.config.remat_frontend = True
if not dropout:
    bridge.config.attention_dropout = 0.0
    bridge.config.hidden_dropout = 0.0
head = Linear(input_size=1024, n_neurons=20)
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
params = {"wav2vec2": bridge.init(k1), "model": head.init(k2)}
frames = bridge.config.output_length(samples)
print(f"frames: {frames}  attention_dropout: {bridge.config.attention_dropout}")
rng = np.random.default_rng(0)
wavs = jnp.asarray(rng.normal(size=(1, samples)), jnp.float32)
anno = jnp.zeros((1, frames, 4), jnp.int32)
lens = jnp.ones((1,), jnp.float32)


@jax.jit
def step(params, key):
    def loss_fn(p):
        p = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            p)
        feats = bridge(p["wav2vec2"], wavs.astype(jnp.bfloat16), rng=key,
                       train=True)
        logits = head(p["model"], feats).astype(jnp.float32)
        return losses.bce_loss(logits[:, :, 0],
                               anno[:, :, 0].astype(jnp.float32),
                               length=lens, pos_weight=15.0)
    return jax.value_and_grad(loss_fn)(params)


try:
    l, g = step(params, jax.random.PRNGKey(1))
    np.asarray(l)
    t0 = time.perf_counter()
    n_iters = 3
    for i in range(n_iters):
        l, g = step(params, jax.random.PRNGKey(i))
    np.asarray(l)
    dt = (time.perf_counter() - t0) / n_iters
    fwd = flops_util.amt_forward_flops(bridge.config, samples)
    required = 3.0 * fwd          # fwd + bwd
    # per-layer remat recomputes every encoder layer fwd; remat_frontend
    # additionally recomputes the conv frontend during the backward
    recompute = flops_util.encoder_flops(bridge.config, frames)
    if bridge.config.remat_frontend:
        recompute += flops_util.conv_frontend_flops(bridge.config, samples)
    executed = required + recompute
    peak = flops_util.peak_flops_per_sec()
    print(f"OK loss={float(np.asarray(l)):.4f} step={dt:.2f}s "
          f"-> {seconds / dt:.1f} audio-sec/s | "
          f"model MFU {required / dt / peak:.3f} "
          f"(hardware util {executed / dt / peak:.3f}; "
          f"fwd TFLOPs {fwd / 1e12:.1f}, recompute {recompute / 1e12:.1f})")
except Exception as e:
    print("FAILED:", str(e)[:4000])
