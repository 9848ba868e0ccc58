"""Guided attention / STOI losses, beamformer lobe, dynamic bucketing iterator."""
import numpy as np

import jax.numpy as jnp


def test_guided_attention_loss():
    from svt_speechbrain_tpu.nnet.loss.guidedattn_loss import GuidedAttentionLoss

    crit = GuidedAttentionLoss(sigma=0.2)
    b, t, u = 2, 10, 12
    # diagonal attention → near-zero loss; anti-diagonal → large
    diag = np.zeros((b, t, u), np.float32)
    anti = np.zeros((b, t, u), np.float32)
    for i in range(t):
        diag[:, i, int(i * u / t)] = 1.0
        anti[:, i, u - 1 - int(i * u / t)] = 1.0
    il = np.array([u, u])
    tl = np.array([t, t])
    l_diag = float(crit(jnp.asarray(diag), il, tl))
    l_anti = float(crit(jnp.asarray(anti), il, tl))
    assert l_diag < l_anti
    assert l_diag < 0.05


def test_stoi_loss_orders_quality():
    from svt_speechbrain_tpu.nnet.loss.stoi_loss import stoi_loss

    rng = np.random.default_rng(0)
    t = 10000
    clean = np.sin(2 * np.pi * 300 * np.arange(t) / 10000).astype(np.float32)
    clean = clean * (1 + 0.5 * np.sin(2 * np.pi * 3 * np.arange(t) / 10000)).astype(np.float32)
    noisy = clean + 0.8 * rng.normal(size=t).astype(np.float32)
    batch = lambda x: jnp.asarray(x[None])
    perfect = float(stoi_loss(batch(clean), batch(clean)))
    degraded = float(stoi_loss(batch(noisy), batch(clean)))
    assert perfect < degraded  # loss = -STOI; perfect is most intelligible
    assert perfect < -0.95


def test_delaysum_beamformer_lobe():
    from svt_speechbrain_tpu.models.beamform_multimic import DelaySum_Beamformer

    rng = np.random.default_rng(0)
    base = rng.normal(size=17000).astype(np.float32)
    x = np.stack([base[:16000], base[5:16005]], axis=-1)[None]
    bf = DelaySum_Beamformer(sampling_rate=16000, tdoa_max=20)
    out = bf(None, jnp.asarray(x))
    assert out.shape == (1, 16000)
    # beamformed output should correlate strongly with the source
    c = np.corrcoef(np.asarray(out)[0, 1000:15000], base[1000:15000])[0, 1]
    assert c > 0.9


def test_dynamic_bucketed_batch():
    import random

    from svt_speechbrain_tpu.dataio.iterators import dynamic_bucketed_batch

    rng = np.random.default_rng(0)
    pivot_rng = random.Random(7)
    stream = ({"id": i, "duration": int(rng.integers(50, 500))}
              for i in range(500))
    batches = list(dynamic_bucketed_batch(
        stream, len_key="duration", buffersize=128,
        sampler_kwargs={"target_batch_numel": 4000, "max_batch_size": 32,
                        "max_padding_ratio": 0.5,
                        "randint_generator": pivot_rng.randint}))
    seen = sorted(s["id"] for b in batches for s in b)
    assert seen == list(range(500))  # exact partition, nothing dropped
    # padding waste bounded within batches (enforced by max_padding_ratio)
    for b in batches:
        if len(b) > 4:
            lens = [s["duration"] for s in b]
            assert 1.0 - sum(lens) / (len(lens) * max(lens)) <= 0.5 + 1e-9
