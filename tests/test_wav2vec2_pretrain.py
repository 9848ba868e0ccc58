"""wav2vec2 pretraining objective: loss sanity + learning signal."""
import numpy as np

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.models.wav2vec2 import Wav2Vec2Config
from svt_speechbrain_tpu.models.wav2vec2_pretrain import (
    Wav2Vec2Pretrain, HuggingFaceWav2Vec2Pretrain, sample_negative_indices,
)

TINY = Wav2Vec2Config(hidden_size=32, num_layers=2, num_heads=4, ffn_size=64,
                      conv_dim=(16,) * 7, num_conv_pos_embeddings=16,
                      num_conv_pos_embedding_groups=4)


def test_pretrain_forward_and_grads():
    model = Wav2Vec2Pretrain(TINY, codevector_dim=16, num_negatives=8)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(2, 16000)), jnp.float32)
    frames = TINY.output_length(16000)
    mask, negatives = model.sample_masks(2, frames, rng)
    assert mask.sum() > 0

    def loss_fn(p):
        loss, aux = model(p, wav, jnp.asarray(mask), jnp.asarray(negatives),
                          rng=jax.random.PRNGKey(1), train=True)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0


def test_pretrain_learns_on_one_batch():
    import functools
    import optax

    model = Wav2Vec2Pretrain(TINY, codevector_dim=16, num_negatives=8,
                             diversity_loss_weight=0.0)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(2, 8000)), jnp.float32)
    frames = TINY.output_length(8000)
    mask, negatives = model.sample_masks(2, frames, rng)
    mask_j, neg_j = jnp.asarray(mask), jnp.asarray(negatives)

    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            # deterministic hard-argmax targets isolate the context network's
            # learning signal (full pretraining anneals the Gumbel noise)
            loss, _ = model(p, wav, mask_j, neg_j, rng=None, train=False)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(60):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 1.0  # overfits toward zero


def test_bridge_and_negative_sampling():
    bridge = HuggingFaceWav2Vec2Pretrain(
        source="wav2vec2-base", arch_overrides=dict(
            hidden_size=32, num_layers=1, num_heads=4, ffn_size=64,
            conv_dim=(16,) * 7, num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4))
    params = bridge.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.normal(size=(2, 8000)), jnp.float32)
    mask, negatives = bridge.sample_masks(2, 8000, rng)
    loss, aux = bridge(params, wav, jnp.asarray(mask), jnp.asarray(negatives))
    assert np.isfinite(float(loss))
    assert "codebook_perplexity" in aux

    # negatives never point at their own position
    mask_np, neg_np = np.asarray(mask), np.asarray(negatives)
    for b in range(2):
        for t in np.flatnonzero(mask_np[b]):
            assert t not in neg_np[b, t] or len(np.flatnonzero(mask_np[b])) <= 1
