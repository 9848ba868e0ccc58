#!/usr/bin/env python3
"""Training-throughput benchmark: full AMT train step (wav2vec2-large
forward + 4-term loss + backward + Adam/Adadelta updates) on one chip.

Not run by the driver (which runs ``bench.py``); prints one JSON line with
audio-seconds trained per wall-clock second. ``BENCH_TRAIN_REMAT=1`` enables
per-layer rematerialization.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

if os.environ.get("BENCH_TRAIN_RNG", "rbg") == "rbg":
    jax.config.update("jax_default_prng_impl", "rbg")
try:  # persistent compile cache: repeat bench runs skip the compile
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/svt_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # older jax without the knobs — compile as usual
    pass


def measure():
    """Run the train-throughput measurement; returns the result dict.
    Called by ``main()`` and by ``bench.py``'s standing train section."""
    from svt_speechbrain_tpu.models.wav2vec2 import HuggingFaceWav2Vec2
    from svt_speechbrain_tpu.nnet.linear import Linear
    from svt_speechbrain_tpu.nnet import losses

    batch = int(os.environ.get("BENCH_TRAIN_BATCH", "16"))
    seconds = 5
    samples = seconds * 16000
    bridge = HuggingFaceWav2Vec2(source="facebook/wav2vec2-large-lv60",
                                 output_norm=True)
    bridge.config.remat = os.environ.get("BENCH_TRAIN_REMAT", "0") == "1"
    bridge.config.attention_impl = os.environ.get("BENCH_TRAIN_ATTN", "auto")
    head = Linear(input_size=1024, n_neurons=20)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {"wav2vec2": bridge.init(k1), "model": head.init(k2)}

    tx_enc = optax.adam(5e-5)
    tx_head = optax.adadelta(3e-4, rho=0.95, eps=1e-8)
    opt_states = {"enc": tx_enc.init(params["wav2vec2"]),
                  "head": tx_head.init(params["model"])}

    frames = bridge.config.output_length(samples)
    rng = np.random.default_rng(0)
    wavs = jnp.asarray(rng.normal(size=(batch, samples)), jnp.float32)
    anno = jnp.asarray(np.stack([
        (rng.random((batch, frames)) > 0.9).astype(np.int32),
        (rng.random((batch, frames)) > 0.9).astype(np.int32),
        rng.integers(0, 5, size=(batch, frames)).astype(np.int32),
        rng.integers(0, 13, size=(batch, frames)).astype(np.int32)], axis=-1))
    lens = jnp.ones((batch,), jnp.float32)

    bf16 = os.environ.get("BENCH_TRAIN_PRECISION", "fp32") == "bf16"

    @jax.jit
    def step(params, opt_states, rng_key):
        def loss_fn(p):
            if bf16:  # fp32 master params, bf16 compute (the Brain's policy)
                p = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16)
                    if x.dtype == jnp.float32 else x, p)
            feats = bridge(p["wav2vec2"], wavs.astype(jnp.bfloat16) if bf16 else wavs,
                           rng=rng_key, train=True)
            logits = head(p["model"], feats).astype(jnp.float32)
            onset = losses.bce_loss(logits[:, :, 0], anno[:, :, 0].astype(jnp.float32),
                                    length=lens, pos_weight=15.0, allowed_len_diff=60)
            offset = losses.bce_loss(logits[:, :, 1], anno[:, :, 1].astype(jnp.float32),
                                     length=lens, allowed_len_diff=60)
            octave = losses.nll_loss(jax.nn.log_softmax(logits[:, :, 2:7]),
                                     anno[:, :, 2], length=lens, allowed_len_diff=60)
            pitch = losses.nll_loss(jax.nn.log_softmax(logits[:, :, 7:]),
                                    anno[:, :, 3], length=lens, allowed_len_diff=60)
            return onset + offset + octave + pitch

        loss, grads = jax.value_and_grad(loss_fn)(params)
        gn = optax.global_norm(grads)
        clip = jnp.minimum(1.0, 5.0 / (gn + 1e-12))
        grads = jax.tree_util.tree_map(lambda g: g * clip, grads)
        u_e, st_e = tx_enc.update(grads["wav2vec2"], opt_states["enc"], params["wav2vec2"])
        u_h, st_h = tx_head.update(grads["model"], opt_states["head"], params["model"])
        new_params = {"wav2vec2": optax.apply_updates(params["wav2vec2"], u_e),
                      "model": optax.apply_updates(params["model"], u_h)}
        return new_params, {"enc": st_e, "head": st_h}, loss

    key = jax.random.PRNGKey(0)
    params, opt_states, loss = step(params, opt_states, key)
    # block_until_ready through the relayed link returns early; a d2h of the
    # scalar loss is the honest synchronization point
    np.asarray(loss)

    n_iters = int(os.environ.get("BENCH_TRAIN_ITERS", "10"))
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(n_iters):
            key, sub = jax.random.split(key)
            params, opt_states, loss = step(params, opt_states, sub)
        np.asarray(loss)
        dt = time.perf_counter() - t0
        best = max(best, n_iters * batch * seconds / dt)

    # MFU from analytic train FLOPs (fwd + 2×fwd backward, +1×fwd if remat)
    from svt_speechbrain_tpu.utils.flops import (
        amt_train_flops, peak_flops_per_sec)
    flops_per_audio_sec = amt_train_flops(
        bridge.config, samples, remat=bridge.config.remat) / seconds
    achieved = flops_per_audio_sec * best

    return {
        "metric": "amt_train_rtfx_w2v2_large",
        "value": round(best, 2),
        "unit": "audio_sec_per_sec_per_chip",
        "batch": batch,
        "remat": bridge.config.remat,
        "precision": "bf16" if bf16 else "fp32",
        "tflops_per_sec": round(achieved / 1e12, 2),
        "mfu": round(achieved / peak_flops_per_sec(), 4),
    }


def main():
    print(json.dumps(measure()))


if __name__ == "__main__":
    main()
