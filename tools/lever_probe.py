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

    # in-kernel fold A/B: the full fused frontend with the widened layer-0
    # contraction (ops/conv_frontend.py fold0) vs baseline
    for fold0 in (1, 8, 16):
        packed = pack_weights(fe_params, dtype=jnp.bfloat16, fold0=fold0)
        timed(f"frontend fold0={fold0}",
              lambda w, jitter, f0=fold0, pk=packed: fused_conv_frontend(
                  fe_params, w + jitter, fold0=f0, packed=pk), wavs)

    # grouped pos-conv alternatives (docs/PERF.md residual lever):
    # (B, T, 1024) k=128 g=16 "same" conv, bf16
    tt, cc, kk, gg = 249, 1024, 128, 16
    ii = cc // gg
    x = jnp.asarray(rng.normal(size=(B, tt, cc)), jnp.bfloat16)
    wg = jnp.asarray(rng.normal(size=(kk, ii, cc)) * 0.05, jnp.bfloat16)

    def posconv_grouped(x, w, jitter):
        xp = jnp.pad(x + jitter, ((0, 0), (kk // 2, kk // 2), (0, 0)))
        return jax.lax.conv_general_dilated(
            xp, w, (1,), "VALID", feature_group_count=gg,
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32)[:, :-1]

    timed("posconv grouped (current)", posconv_grouped, x, wg)

    # dense conv with the block-diagonal weight materialized (16x FLOPs,
    # full-K contraction)
    wdense = jnp.zeros((kk, cc, cc), jnp.bfloat16)
    for g in range(gg):
        wdense = wdense.at[:, g * ii:(g + 1) * ii,
                           g * ii:(g + 1) * ii].set(
            wg[:, :, g * ii:(g + 1) * ii])

    def posconv_dense(x, w, jitter):
        xp = jnp.pad(x + jitter, ((0, 0), (kk // 2, kk // 2), (0, 0)))
        return jax.lax.conv_general_dilated(
            xp, w, (1,), "VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32)[:, :-1]

    timed("posconv dense block-diag", posconv_dense, x, wdense)

    # tap-folded batched einsum: contraction K = R*I per tap block, scan
    # over k/R blocks; batch dim = groups
    for r in (8, 16):
        wfold = (wg.reshape(kk // r, r, ii, gg, ii)
                 .transpose(3, 0, 1, 2, 4)
                 .reshape(gg, kk // r, r * ii, ii))  # (g, blocks, R*I, I)

        def posconv_tapfold(x, w, jitter, r=r):
            xp = jnp.pad(x + jitter, ((0, 0), (kk // 2, kk // 2), (0, 0)))
            xg = xp.reshape(B, -1, gg, ii).transpose(2, 0, 1, 3)  # (g,B,Tp,I)

            def block(j, acc):
                sl = jax.lax.dynamic_slice_in_dim(xg, j * r, tt + r - 1, 2)
                # windows of R consecutive frames: (g, B, T, R*I)
                win = jnp.concatenate(
                    [jax.lax.slice_in_dim(sl, s, s + tt, axis=2)
                     for s in range(r)], axis=-1)
                return acc + jnp.einsum(
                    "gbtk,gko->gbto", win, w[:, j],
                    preferred_element_type=jnp.float32)

            acc = jnp.zeros((gg, B, tt, ii), jnp.float32)
            out = jax.lax.fori_loop(0, kk // r, block, acc)
            return out.transpose(1, 2, 0, 3).reshape(B, tt, cc)

        timed(f"posconv tapfold R={r}", posconv_tapfold, x, wfold)


if __name__ == "__main__":
    main()
