"""On-chip A/B: fused quantize+matmul Pallas kernel vs the XLA a8w8 path
vs bf16, at the model's real matmul shapes.

The XLA int8 path (``ops/quant.int8_matmul``) quantizes activations in a
separate VPU pass — an extra HBM round trip of x per matmul. The fused
kernel (``ops/quant.int8_matmul_fused``) folds amax/round into the operand
load. This probe times all three per shape with the honest harness
(scan over DISTINCT lhs so nothing hoists; full output reduced so nothing
slice-DCEs — docs/PERF.md "timing honesty").

Shapes: encoder FFN up/down (1024->4096, 4096->1024) and attention
projection (1024->1024) at the bench batch (192 x 249 frames ~ 48k tokens).

Run under the default (axon) env:  python tools/fused_qmm_probe.py
"""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from svt_speechbrain_tpu.ops.quant import (int8_matmul, int8_matmul_fused,
                                           quantize_weight)

# ITERS amortizes the ONE scalar d2h per timed run (10-25 ms in bad link
# windows — at ITERS=4 it poisoned every number by ~5 ms/iter); M is a
# quarter of the bench tokens so the 32-deep lhs stack fits HBM.
ITERS = 16
M = 12288
SHAPES = [("ffn_up", 1024, 4096), ("ffn_down", 4096, 1024),
          ("attn_proj", 1024, 1024)]


def bench(name, f, a, *args):
    @jax.jit
    def run(a, *args):
        def body(carry, ai):
            return carry + f(ai, *args).astype(jnp.float32).sum(), None
        return lax.scan(body, jnp.float32(0), a)[0]

    np.asarray(run(a, *args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(a, *args))
        best = min(best, time.perf_counter() - t0)
    per = best / ITERS * 1e3
    return name, per


def main():
    print("device:", jax.devices()[0])
    for label, k, n in SHAPES:
        ks = jax.random.split(jax.random.PRNGKey(0), ITERS + 1)
        a = jnp.stack([jax.random.normal(kk, (M, k), jnp.bfloat16)
                       for kk in ks[:-1]])
        w = jax.random.normal(ks[-1], (k, n))
        w8, ws = quantize_weight(w)
        wb = w.astype(jnp.bfloat16)

        rows = [
            bench("bf16", lambda x, w: jnp.dot(x, w), a, wb),
            bench("xla_a8w8", int8_matmul, a, w8, ws),
            bench("fused_a8w8", int8_matmul_fused, a, w8, ws),
        ]
        flops = 2 * M * k * n
        out = "  ".join(f"{nm} {ms:.2f} ms ({flops / (ms / 1e3) / 1e12:.0f}T)"
                        for nm, ms in rows)
        print(f"{label} (M={M}, {k}->{n}): {out}")


if __name__ == "__main__":
    main()
