"""Flash-attention kernel: interpreter-mode correctness vs the XLA reference
(TPU perf is exercised by bench)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.ops.flash_attention import flash_attention, _xla_attention


@pytest.mark.parametrize("tq,tk", [(256, 256), (300, 256), (512, 512),
                                   (249, 249), (100, 100)])
def test_flash_matches_xla_interpret(tq, tk):
    rng = np.random.default_rng(0)
    b, h, d = 2, 4, 64
    q = jnp.asarray(rng.normal(size=(b, h, tq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, tk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, tk, d)), jnp.float32)
    got = flash_attention(q, k, v, None, None, 128, 128, True)
    expected = _xla_attention(q, k, v, 1.0 / np.sqrt(d))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("tk,lens", [(249, (249, 200, 64, 1)),
                                     (512, (512, 300, 128, 0))])
def test_flash_lengths_mask_matches_xla(tk, lens):
    """Per-row valid-length masking equals a boolean prefix mask in XLA —
    including fully-padded rows, where both paths now emit zeros."""
    rng = np.random.default_rng(3)
    b, h, d = len(lens), 4, 64
    q = jnp.asarray(rng.normal(size=(b, h, tk, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, tk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, tk, d)), jnp.float32)
    lengths = jnp.asarray(lens, jnp.int32)
    got = np.asarray(flash_attention(q, k, v, lengths, None, 128, 128, True))
    expected = np.asarray(_xla_attention(q, k, v, 1.0 / np.sqrt(d), lengths))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=1e-4)
    for i, n in enumerate(lens):
        if n == 0:  # both impls zero fully-padded rows
            np.testing.assert_array_equal(got[i], 0.0)


def test_flash_padded_rows_match_unpadded():
    """A batch row padded to a longer Tk gives the same output as running
    the row unpadded — the exact-lengths eval property at the kernel level."""
    rng = np.random.default_rng(4)
    h, d, n = 2, 64, 137
    q1 = jnp.asarray(rng.normal(size=(1, h, n, d)), jnp.float32)
    k1 = jnp.asarray(rng.normal(size=(1, h, n, d)), jnp.float32)
    v1 = jnp.asarray(rng.normal(size=(1, h, n, d)), jnp.float32)
    unpadded = np.asarray(flash_attention(q1, k1, v1, None, None, 128, 128, True))
    pad = [(0, 0), (0, 0), (0, 256 - n), (0, 0)]
    qp, kp, vp = jnp.pad(q1, pad), jnp.pad(k1, pad), jnp.pad(v1, pad)
    padded = np.asarray(flash_attention(
        qp, kp, vp, jnp.asarray([n], jnp.int32), None, 128, 128, True))
    np.testing.assert_allclose(padded[:, :, :n], unpadded, atol=2e-5, rtol=1e-4)


def test_flash_gradients_flow():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 2, 128, 64)), jnp.float32)

    def loss(q):
        return jnp.sum(flash_attention(q, q, q, None, None, 128, 128, True))

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_flash_gradients_flow_with_lengths():
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(2, 2, 100, 64)), jnp.float32)
    lengths = jnp.asarray([100, 60], jnp.int32)

    def loss(q):
        return jnp.sum(flash_attention(q, q, q, lengths, None, 128, 128, True))

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


@pytest.mark.parametrize("tk,lens", [
    (249, (249, 200, 64, 0)),     # boundary-panel masking + zero-length row
    (512, (512, 300, 128, 1)),    # block-multiple Tk, near-empty row
    (100, None),                  # no lengths at all
])
def test_flash_backward_matches_xla_vjp(tk, lens):
    """The Pallas backward (dQ + dK/dV kernels rebuilding P from the saved
    logsumexp) equals the XLA einsum attention's VJP for q, k, AND v under
    every masking regime — including rows whose grads flow only through
    a partial key prefix."""
    rng = np.random.default_rng(7)
    b = 4 if lens else 2
    h, d = 4, 64
    q = jnp.asarray(rng.normal(size=(b, h, tk, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, tk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, tk, d)), jnp.float32)
    lengths = None if lens is None else jnp.asarray(lens, jnp.int32)
    scale = 1.0 / np.sqrt(d)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, lengths, None, 128, 128, True)
        return jnp.sum(jnp.sin(o) * jnp.cos(o * 0.5))

    def loss_xla(q, k, v):
        o = _xla_attention(q, k, v, scale, lengths)
        return jnp.sum(jnp.sin(o) * jnp.cos(o * 0.5))

    lf, gf = jax.value_and_grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    lx, gx = jax.value_and_grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-5)
    for name, got, want in zip(("dq", "dk", "dv"), gf, gx):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-3, err_msg=name)


def test_flash_backward_unequal_tq_tk():
    """Cross-attention shapes (Tq != Tk) and non-block-multiple both ways."""
    rng = np.random.default_rng(8)
    b, h, d, tq, tk = 2, 2, 64, 70, 150
    q = jnp.asarray(rng.normal(size=(b, h, tq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, tk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, tk, d)), jnp.float32)
    lengths = jnp.asarray([150, 90], jnp.int32)
    scale = 1.0 / np.sqrt(d)

    gf = jax.grad(lambda q, k, v: jnp.sum(
        flash_attention(q, k, v, lengths, None, 64, 128, True) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lambda q, k, v: jnp.sum(
        _xla_attention(q, k, v, scale, lengths) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for name, got, want in zip(("dq", "dk", "dv"), gf, gx):
        assert got.shape == want.shape, name
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-3, err_msg=name)


def test_flash_backward_bf16_finite():
    """bf16 inputs (the training compute dtype): backward runs the same
    kernels and produces finite, nonzero bf16 grads."""
    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.normal(size=(2, 2, 256, 64)), jnp.bfloat16)
    lengths = jnp.asarray([256, 100], jnp.int32)

    g = jax.grad(lambda q: jnp.sum(
        flash_attention(q, q, q, lengths, None, 128, 128,
                        True).astype(jnp.float32)))(q)
    assert g.dtype == jnp.bfloat16
    gn = np.asarray(g.astype(jnp.float32))
    assert np.isfinite(gn).all()
    assert np.abs(gn).max() > 0


# ---------------------------------------------------------------------------
# short-sequence fused attention (flash_attention_short)
# ---------------------------------------------------------------------------

from svt_speechbrain_tpu.ops.flash_attention import flash_attention_short


@pytest.mark.parametrize("tq,tk", [(249, 249), (17, 33), (128, 256)])
def test_flash_short_matches_xla_interpret(tq, tk):
    rng = np.random.default_rng(3)
    b, h, d = 2, 4, 64
    q = jnp.asarray(rng.normal(size=(b, h, tq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, tk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, tk, d)), jnp.float32)
    scale = 1.0 / np.sqrt(d)
    got = flash_attention_short(q, k, v, None, None, 8, True)
    want = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("lens", [[249, 100], [33, 0]])
def test_flash_short_lengths(lens):
    rng = np.random.default_rng(4)
    b, h, t, d = 2, 4, 249, 64
    q = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    lengths = jnp.asarray(lens, jnp.int32)
    got = flash_attention_short(q, k, v, lengths, None, 8, True)
    want = _xla_attention(q, k, v, 1.0 / np.sqrt(d), lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_flash_short_backward_matches_xla():
    """The short kernel's VJP differentiates the einsum formulation."""
    rng = np.random.default_rng(5)
    b, h, t, d = 2, 2, 33, 16
    q = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    lengths = jnp.asarray([33, 12], jnp.int32)
    scale = 1.0 / np.sqrt(d)
    gf = jax.grad(lambda q, k, v: jnp.sum(
        flash_attention_short(q, k, v, lengths, None, 8, True) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lambda q, k, v: jnp.sum(
        _xla_attention(q, k, v, scale, lengths) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for name, got, want in zip(("dq", "dk", "dv"), gf, gx):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-3, err_msg=name)


def test_fast_gelu_dispatch():
    """f32 keeps the exact erf GELU; bf16 uses the tanh form, which is
    sub-ULP-equal to the erf form at bf16 output precision (max abs error
    bounded by ~1 bf16 ulp of the output; deep-negative tail < 1e-6)."""
    from svt_speechbrain_tpu.nnet.activations import fast_gelu

    x32 = jnp.linspace(-10.0, 10.0, 20001, dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(fast_gelu(x32)),
        np.asarray(jax.nn.gelu(x32, approximate=False)))

    x16 = x32.astype(jnp.bfloat16)
    got = np.asarray(fast_gelu(x16).astype(np.float32))
    want = np.asarray(jax.nn.gelu(x32, approximate=False))
    err = np.abs(got - want)
    # one bf16 output rounding + the analytic tanh-approximation error
    ulp = np.maximum(np.abs(want) * 2.0 ** -7, 1e-6)
    assert (err <= 2.5 * ulp + 5e-4).all()


# ---------------------------------------------------------------------------
# In-kernel attention dropout
# ---------------------------------------------------------------------------

def _dropout_reference(q, k, v, lengths, seed, rate):
    """Einsum attention with the flash kernels' EXACT mask (XLA twin)."""
    from svt_speechbrain_tpu.ops.flash_attention import attention_dropout_mask

    b, h, tq, d = q.shape
    tk = k.shape[2]
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / np.sqrt(d)
    if lengths is not None:
        col = jnp.arange(tk)
        s = jnp.where(col[None, None, None, :] < lengths[:, None, None, None],
                      s, -1e30)
    w = jax.nn.softmax(s, axis=-1)
    if lengths is not None:
        w = jnp.where((lengths > 0)[:, None, None, None], w, 0.0)
    w = w * attention_dropout_mask(seed, b, h, tq, tk, rate)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v.astype(jnp.float32))


@pytest.mark.parametrize("tq,tk,lens", [
    (256, 256, None),
    (249, 249, (249, 200, 64)),
])
def test_flash_dropout_matches_masked_einsum(tq, tk, lens):
    """Forward with in-kernel dropout == einsum with the identical mask
    regenerated in XLA (the mask is a pure function of seed + global
    coordinates, so the two paths must agree to fp tolerance)."""
    rng = np.random.default_rng(10)
    b, h, d = (len(lens) if lens else 2), 4, 64
    q = jnp.asarray(rng.normal(size=(b, h, tq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, tk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, tk, d)), jnp.float32)
    lengths = None if lens is None else jnp.asarray(lens, jnp.int32)
    got = np.asarray(flash_attention(
        q, k, v, lengths, None, 128, 128, True,
        dropout_seed=jnp.int32(1234), dropout_rate=0.3))
    want = np.asarray(_dropout_reference(q, k, v, lengths, 1234, 0.3))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_flash_dropout_grads_match_masked_einsum():
    """dQ/dK/dV through the Pallas backward (masks regenerated in-kernel
    from coordinates) == autodiff through the masked einsum formulation."""
    rng = np.random.default_rng(11)
    b, h, t, d = 2, 2, 256, 64
    q = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    lengths = jnp.asarray([256, 180], jnp.int32)
    seed, rate = 77, 0.25
    co = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)

    def flash_loss(q, k, v):
        o = flash_attention(q, k, v, lengths, None, 128, 128, True,
                            dropout_seed=jnp.int32(seed), dropout_rate=rate)
        return jnp.sum(o * co)

    def ref_loss(q, k, v):
        return jnp.sum(_dropout_reference(q, k, v, lengths, seed, rate) * co)

    got = jax.grad(flash_loss, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=5e-4, rtol=1e-3,
                                   err_msg=f"d{name} mismatch")


def test_flash_dropout_block_geometry_independent():
    """The mask is a function of global coordinates, not block tiling:
    different (block_q, block_k) choices give identical outputs."""
    rng = np.random.default_rng(12)
    b, h, t, d = 1, 2, 384, 64
    q = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    a = np.asarray(flash_attention(q, k, v, None, None, 128, 128, True,
                                   dropout_seed=jnp.int32(5), dropout_rate=0.2))
    bb = np.asarray(flash_attention(q, k, v, None, None, 64, 384, True,
                                    dropout_seed=jnp.int32(5), dropout_rate=0.2))
    np.testing.assert_allclose(a, bb, atol=3e-5, rtol=1e-4)


def test_attention_dropout_mask_statistics():
    """Keep rate ~= 1-p, kept entries scaled by 1/(1-p), seeds decorrelate."""
    from svt_speechbrain_tpu.ops.flash_attention import attention_dropout_mask

    m1 = np.asarray(attention_dropout_mask(1, 2, 4, 128, 128, 0.3))
    kept = m1 > 0
    assert abs(kept.mean() - 0.7) < 0.01
    np.testing.assert_allclose(m1[kept], 1.0 / 0.7, rtol=1e-6)
    m2 = np.asarray(attention_dropout_mask(2, 2, 4, 128, 128, 0.3))
    # different seeds give (nearly) independent masks
    agree = ((m1 > 0) == (m2 > 0)).mean()
    assert 0.5 < agree < 0.65  # p(agree) = 0.7^2 + 0.3^2 = 0.58

    # rows decorrelated too (guards the hash chaining against collisions)
    flat = (m1 > 0).reshape(8, -1)
    for i in range(7):
        assert 0.45 < (flat[i] == flat[i + 1]).mean() < 0.7


def test_sdpa_short_row_dispatch(monkeypatch):
    """At Tk <= SHORT_T_MAX with no dropout/bias/mask, impl='auto' routes to
    flash_attention_short (verified by interception) and the result equals
    the einsum path."""
    import svt_speechbrain_tpu.ops.flash_attention as fa
    from svt_speechbrain_tpu.nnet.attention import scaled_dot_product_attention

    calls = []
    real_short = fa.flash_attention_short

    def spy_short(q, k, v, lengths=None, scale=None, group=8,
                  interpret=False):
        calls.append(k.shape[2])
        return real_short(q, k, v, lengths, scale, group, True)

    monkeypatch.setattr(fa, "flash_attention_available", lambda: True)
    monkeypatch.setattr(fa, "flash_attention_short", spy_short)

    rng = np.random.default_rng(14)
    b, h, t, d = 2, 4, 249, 64
    q = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    lengths = jnp.asarray([249, 180], jnp.int32)
    got = scaled_dot_product_attention(q, q, q, key_lengths=lengths,
                                       return_weights=False)
    assert calls == [t], "short kernel was not dispatched"
    want = scaled_dot_product_attention(q, q, q, key_lengths=lengths,
                                        return_weights=False, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)

    # dropout active -> einsum path (the short kernel has no in-kernel mask)
    calls.clear()
    scaled_dot_product_attention(q, q, q, dropout_rate=0.1,
                                 rng=jax.random.PRNGKey(0), train=True,
                                 return_weights=False)
    assert calls == []


def test_sdpa_dropout_dispatches_to_flash_on_tpu_semantics():
    """scaled_dot_product_attention with train dropout no longer forces the
    einsum path when flash would dispatch — on CPU (no flash) it must still
    run and apply dropout (output differs from eval)."""
    from svt_speechbrain_tpu.nnet.attention import scaled_dot_product_attention

    rng = np.random.default_rng(13)
    q = jnp.asarray(rng.normal(size=(1, 2, 64, 64)), jnp.float32)
    out_eval = scaled_dot_product_attention(q, q, q, train=False)
    out_train = scaled_dot_product_attention(
        q, q, q, dropout_rate=0.5, rng=jax.random.PRNGKey(0), train=True)
    assert not np.allclose(np.asarray(out_eval), np.asarray(out_train))
