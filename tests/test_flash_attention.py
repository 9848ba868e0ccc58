"""Flash-attention kernel: interpreter-mode correctness vs the XLA reference
(TPU perf is exercised by bench)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.ops.flash_attention import flash_attention, _xla_attention


@pytest.mark.parametrize("tq,tk", [(256, 256), (300, 256), (512, 512)])
def test_flash_matches_xla_interpret(tq, tk):
    rng = np.random.default_rng(0)
    b, h, d = 2, 4, 64
    q = jnp.asarray(rng.normal(size=(b, h, tq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, tk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, tk, d)), jnp.float32)
    got = flash_attention(q, k, v, None, 128, 128, True)
    expected = _xla_attention(q, k, v, 1.0 / np.sqrt(d))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=2e-5, rtol=1e-4)


def test_flash_fallback_on_ragged_tk():
    """Non-block-multiple Tk silently takes the exact XLA path."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 2, 100, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, 100, 64)), jnp.float32)
    out = flash_attention(q, k, k, None, 128, 128, True)
    expected = _xla_attention(q, k, k, 1.0 / np.sqrt(64))
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_flash_gradients_flow():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 2, 128, 64)), jnp.float32)

    def loss(q):
        return jnp.sum(flash_attention(q, q, q, None, 128, 128, True))

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
