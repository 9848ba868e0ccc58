"""On-chip probe: does XLA reach the int8 MXU rate on v5e?

Times bf16 vs int8 (s8 x s8 -> s32) square matmuls. Honest harness
(see docs/PERF.md "timing honesty"): each iteration consumes a DIFFERENT
lhs (scan over a stacked batch, so nothing is loop-invariant) and the
FULL output is reduced (no slice-pushing DCE). Run under the axon env.
"""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
ITERS = 8


def bench(name, make, acc):
    ks = jax.random.split(jax.random.PRNGKey(0), ITERS + 1)
    a = jnp.stack([make(k, (N, N)) for k in ks[:-1]])
    b = make(ks[-1], (N, N))

    @jax.jit
    def f(a, b):
        def body(carry, ai):
            out = lax.dot_general(ai, b, (((1,), (0,)), ((), ())),
                                  preferred_element_type=acc)
            return carry + out.astype(jnp.float32).sum(), None
        return lax.scan(body, jnp.float32(0), a)[0]

    np.asarray(f(a, b))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(a, b))
        best = min(best, time.perf_counter() - t0)
    ops = 2 * N ** 3 * ITERS
    unit = "TOP/s" if "int8" in name else "TFLOP/s"
    print(f"{name}: {ops / best / 1e12:.1f} {unit}  "
          f"({best * 1e3:.1f} ms / {ITERS} iters)")


def mk_bf16(k, shape):
    return jax.random.normal(k, shape, jnp.bfloat16)


def mk_int8(k, shape):
    return jax.random.randint(k, shape, -127, 127, jnp.int8)


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    bench("bf16", mk_bf16, jnp.float32)
    bench("int8", mk_int8, jnp.int32)
    # mixed: int8 weights dequantized to bf16 on the fly (weight-only PTQ
    # shape) — measures whether dequant-into-matmul is free or a tax
    ks = jax.random.split(jax.random.PRNGKey(1), ITERS + 1)
    a = jnp.stack([mk_bf16(k, (N, N)) for k in ks[:-1]])
    w8 = mk_int8(ks[-1], (N, N))
    scale = jnp.full((1, N), 0.01, jnp.bfloat16)

    @jax.jit
    def f(a, w8, scale):
        def body(carry, ai):
            w = w8.astype(jnp.bfloat16) * scale
            out = lax.dot_general(ai, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
            return carry + out.sum(), None
        return lax.scan(body, jnp.float32(0), a)[0]

    np.asarray(f(a, w8, scale))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(a, w8, scale))
        best = min(best, time.perf_counter() - t0)
    print(f"w8a16 (dequant-in-loop): {2 * N**3 * ITERS / best / 1e12:.1f} "
          f"TFLOP/s  ({best * 1e3:.1f} ms / {ITERS} iters)")
