"""On-chip A/B probe for the residual device levers (docs/PERF.md).

Times (DCE-proof: full-output reduction in a fori_loop, scalar d2h):
  * flash_attention_short group size sweep
  * fused conv frontend tile_f sweep
Env: B, INNER, GROUPS, TILES.
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

B = int(os.environ.get("B", "192"))
INNER = int(os.environ.get("INNER", "32"))
H, T, D = 16, 249, 64


def timed(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            out = fn(*a, jitter=(acc * 0).astype(jnp.bfloat16))
            return acc + jnp.sum(out).astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, INNER, body, jnp.float32(0.0))

    try:
        np.asarray(loop(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(*args))
            best = min(best, time.perf_counter() - t0)
    except Exception as e:
        print(f"{name:<40s} FAILED: {str(e)[:120]}", flush=True)
        return float("inf")
    print(f"{name:<40s} {best / INNER * 1e3:8.3f} ms", flush=True)
    return best / INNER


def main():
    from svt_speechbrain_tpu.ops.flash_attention import flash_attention_short
    from svt_speechbrain_tpu.ops.conv_frontend import (
        fused_conv_frontend, pack_weights)
    from svt_speechbrain_tpu.models.wav2vec2 import HuggingFaceWav2Vec2

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.bfloat16)

    groups = [int(g) for g in os.environ.get("GROUPS", "4,8,16,32").split(",")]
    for g in groups:
        timed(f"attn_short group={g}",
              lambda q, k, v, jitter, g=g: flash_attention_short(
                  q + jitter, k, v, group=g), q, k, v)

    bridge = HuggingFaceWav2Vec2(source="facebook/wav2vec2-large-lv60",
                                 output_norm=True, freeze=True)
    params = bridge.init(jax.random.PRNGKey(0))
    fe_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16),
        params["encoder"]["feature_extractor"])
    wavs = jnp.asarray(rng.normal(size=(B, 80000)), jnp.bfloat16)

    tiles = [int(t) for t in os.environ.get("TILES", "32,48,64").split(",")]
    for tf in tiles:
        packed = pack_weights(fe_params, dtype=jnp.bfloat16)
        timed(f"frontend tile_f={tf}",
              lambda w, jitter, tf=tf, packed=packed: fused_conv_frontend(
                  fe_params, w + jitter, tile_f=tf, packed=packed), wavs)

    # layer-0 im2col widening A/B (docs/PERF.md residual lever): K=16
    # baseline vs FOLD consecutive outputs into one row (K=5*(FOLD-1)+10
    # padded up, N=FOLD*512). FLOPs grow exactly as fast as the MXU
    # contraction fills, so this measures per-row/sublane overheads only.
    n1, c = 2048, 512
    w16 = jnp.asarray(rng.normal(size=(16, c)), jnp.bfloat16)
    x16 = jnp.asarray(rng.normal(size=(1536, n1, 16)), jnp.bfloat16)
    timed("layer0 K=16 baseline",
          lambda x, w, jitter: jnp.einsum(
              "bnk,kc->bnc", x + jitter, w,
              preferred_element_type=jnp.float32), x16, w16)
    for fold in (4, 8, 16):
        kf = -(-(5 * (fold - 1) + 10) // 16) * 16
        wf = jnp.asarray(rng.normal(size=(kf, fold * c)), jnp.bfloat16)
        xf = jnp.asarray(rng.normal(size=(1536, n1 // fold, kf)),
                         jnp.bfloat16)
        timed(f"layer0 fold={fold} K={kf}",
              lambda x, w, jitter: jnp.einsum(
                  "bnk,kc->bnc", x + jitter, w,
                  preferred_element_type=jnp.float32), xf, wf)


if __name__ == "__main__":
    main()
