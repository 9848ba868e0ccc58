"""Transducer loss vs a brute-force lattice DP (and torchaudio if present)."""
import numpy as np
import pytest

from svt_speechbrain_tpu.nnet.loss.transducer_loss import transducer_loss


def brute_force_rnnt(log_probs, labels, blank):
    """O(T·U) reference DP in numpy (float64)."""
    t_max, u1, v = log_probs.shape
    alpha = np.full((t_max, u1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(t_max):
        for u in range(u1):
            terms = []
            if t == 0 and u == 0:
                continue
            if t > 0:
                terms.append(alpha[t - 1, u] + log_probs[t - 1, u, blank])
            if u > 0:
                terms.append(alpha[t, u - 1] + log_probs[t, u - 1, labels[u - 1]])
            alpha[t, u] = np.logaddexp.reduce(terms)
    return -(alpha[t_max - 1, u1 - 1] + log_probs[t_max - 1, u1 - 1, blank])


@pytest.mark.parametrize("seed", range(3))
def test_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    b, t_max, u, v = 3, 7, 4, 6
    logits = rng.normal(size=(b, t_max, u + 1, v)).astype(np.float32)
    labels = rng.integers(1, v, size=(b, u)).astype(np.int32)

    got = np.asarray(transducer_loss(
        logits, labels, np.ones(b), np.ones(b), blank_index=0, reduction="batch"))

    log_probs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    for i in range(b):
        expected = brute_force_rnnt(log_probs[i].astype(np.float64), labels[i], 0)
        np.testing.assert_allclose(got[i], expected, rtol=1e-4)


def test_variable_lengths():
    rng = np.random.default_rng(10)
    b, t_max, u, v = 2, 8, 5, 4
    logits = rng.normal(size=(b, t_max, u + 1, v)).astype(np.float32)
    labels = rng.integers(1, v, size=(b, u)).astype(np.int32)
    # second item: T=5, U=3
    input_lens = np.array([1.0, 5 / 8])
    target_lens = np.array([1.0, 3 / 5])
    got = np.asarray(transducer_loss(logits, labels, input_lens, target_lens,
                                     blank_index=0, reduction="batch"))
    log_probs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    expected = brute_force_rnnt(log_probs[1, :5, :4].astype(np.float64), labels[1, :3], 0)
    np.testing.assert_allclose(got[1], expected, rtol=1e-4)


def test_gradients_finite():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(2, 6, 4, 5)), jnp.float32)
    labels = jnp.asarray(rng.integers(1, 5, size=(2, 3)), jnp.int32)

    g = jax.grad(lambda lg: transducer_loss(
        lg, labels, jnp.ones(2), jnp.ones(2), 0))(logits)
    assert np.isfinite(np.asarray(g)).all()
    # gradient wrt log-softmax inputs sums to zero over the vocab at used cells
    assert float(jnp.abs(g).max()) > 0
