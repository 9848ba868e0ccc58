"""Pallas / fused transducer lattice: exactness vs the autodiff scan loss
(losses and gradients, variable lengths, both lattice backends)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.loss.transducer_loss import transducer_loss
from svt_speechbrain_tpu.ops.transducer_lattice import (
    transducer_loss_fused, transducer_loss_pallas)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    b, t, u, v = 3, 12, 5, 7
    logits = jnp.asarray(rng.normal(size=(b, t, u + 1, v)), jnp.float32)
    targets = jnp.asarray(rng.integers(1, v, size=(b, u)), jnp.int32)
    ilens = jnp.asarray([1.0, 10 / 12, 7 / 12])
    tlens = jnp.asarray([1.0, 4 / 5, 2 / 5])
    return logits, targets, ilens, tlens


@pytest.mark.parametrize("fn", [transducer_loss_fused, transducer_loss_pallas])
@pytest.mark.parametrize("from_log_probs", [False, True])
def test_fused_matches_autodiff_scan(problem, fn, from_log_probs):
    logits, targets, ilens, tlens = problem
    ref = transducer_loss(logits, targets, ilens, tlens, 0,
                          reduction="batch", from_log_probs=from_log_probs)
    got = fn(logits, targets, ilens, tlens, 0, reduction="batch",
             from_log_probs=from_log_probs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)

    g_ref = jax.grad(lambda l: transducer_loss(
        l, targets, ilens, tlens, 0, from_log_probs=from_log_probs))(logits)
    g_got = jax.grad(lambda l: fn(
        l, targets, ilens, tlens, 0, from_log_probs=from_log_probs))(logits)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               atol=1e-5)


def test_fused_loss_matches_brute_force():
    """Independent check against an exhaustive path-sum DP in numpy."""
    rng = np.random.default_rng(1)
    t, u, v = 5, 3, 4
    logits = rng.normal(size=(1, t, u + 1, v)).astype(np.float32)
    targets = np.array([[1, 2, 3]], np.int32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))

    alpha = np.full((t, u + 1), -np.inf)
    alpha[0, 0] = 0.0
    for ti in range(t):
        for ui in range(u + 1):
            terms = []
            if ti > 0:
                terms.append(alpha[ti - 1, ui] + lp[0, ti - 1, ui, 0])
            if ui > 0:
                terms.append(alpha[ti, ui - 1] + lp[0, ti, ui - 1,
                                                    targets[0, ui - 1]])
            if terms:
                alpha[ti, ui] = np.logaddexp.reduce(terms)
    expected = -(alpha[t - 1, u] + lp[0, t - 1, u, 0])

    for fn in (transducer_loss_fused, transducer_loss_pallas):
        got = float(fn(jnp.asarray(logits), jnp.asarray(targets),
                       jnp.ones((1,)), jnp.ones((1,)), 0))
        np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_fused_under_jit_and_grad_accumulate():
    """jit + value_and_grad wrapping (the Brain's usage pattern)."""
    rng = np.random.default_rng(2)
    b, t, u, v = 2, 8, 4, 6
    logits = jnp.asarray(rng.normal(size=(b, t, u + 1, v)), jnp.float32)
    targets = jnp.asarray(rng.integers(1, v, size=(b, u)), jnp.int32)

    f = jax.jit(jax.value_and_grad(lambda l: transducer_loss_fused(
        l, targets, jnp.ones((b,)), jnp.ones((b,)), 0)))
    loss, g = f(logits)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(g)).all()
    # gradient mass sums to ~0 per frame-position through log_softmax
    np.testing.assert_allclose(np.asarray(g).sum(-1), 0.0, atol=1e-5)
