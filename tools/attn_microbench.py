"""Microbench: XLA einsum attention vs Pallas flash at the AMT shapes."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/svt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
from svt_speechbrain_tpu.ops.flash_attention import flash_attention, _xla_attention

def bench(fn, *args, iters=15):
    out = fn(*args)
    np.asarray(out)  # honest sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters

b, h, d = int(os.environ.get("B", "192")), 16, 64
for t in (249, 512):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.bfloat16)
    lens = jnp.full((b,), t, jnp.int32)
    xla = jax.jit(lambda q, k, v: _xla_attention(q, k, v, 1.0/np.sqrt(d), None))
    t_x = bench(xla, q, k, v)
    line = f"T={t}: xla {t_x*1e3:.2f} ms"
    for bq, bk in ((256, 256), (256, 512)):
        fl = jax.jit(lambda q, k, v, _bq=bq, _bk=bk: flash_attention(q, k, v, lens, None, _bq, _bk))
        try:
            t_f = bench(fl, q, k, v)
            line += f" | flash{bq}/{bk} {t_f*1e3:.2f}"
        except Exception as e:
            line += f" | flash{bq}/{bk} ERR"
    print(line)
