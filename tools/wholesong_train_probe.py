import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os, time
import numpy as np
import jax, jax.numpy as jnp, optax
from svt_speechbrain_tpu.models.wav2vec2 import HuggingFaceWav2Vec2
from svt_speechbrain_tpu.nnet.linear import Linear
from svt_speechbrain_tpu.nnet import losses
import sys
seconds = int(sys.argv[1]) if len(sys.argv) > 1 else 240
samples = seconds * 16000
bridge = HuggingFaceWav2Vec2(source="facebook/wav2vec2-large-lv60", output_norm=True)
bridge.config.remat = True
bridge.config.remat_frontend = True
bridge.config.attention_dropout = 0.0
bridge.config.hidden_dropout = 0.0
head = Linear(input_size=1024, n_neurons=20)
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
params = {"wav2vec2": bridge.init(k1), "model": head.init(k2)}
frames = bridge.config.output_length(samples)
print("frames:", frames)
rng = np.random.default_rng(0)
wavs = jnp.asarray(rng.normal(size=(1, samples)), jnp.float32)
anno = jnp.zeros((1, frames, 4), jnp.int32)
lens = jnp.ones((1,), jnp.float32)
@jax.jit
def step(params, key):
    def loss_fn(p):
        p = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, p)
        feats = bridge(p["wav2vec2"], wavs.astype(jnp.bfloat16), rng=key, train=True)
        logits = head(p["model"], feats).astype(jnp.float32)
        return losses.bce_loss(logits[:, :, 0], anno[:, :, 0].astype(jnp.float32), length=lens, pos_weight=15.0)
    return jax.value_and_grad(loss_fn)(params)
try:
    l, g = step(params, jax.random.PRNGKey(1))
    np.asarray(l)
    t0 = time.perf_counter()
    for i in range(3):
        l, g = step(params, jax.random.PRNGKey(i))
    np.asarray(l)
    dt = (time.perf_counter() - t0) / 3
    print(f"OK loss={float(np.asarray(l)):.4f} step={dt:.2f}s -> {seconds/dt:.1f} audio-sec/s")
except Exception as e:
    print("FAILED:", str(e)[:4000])
