"""Fused Pallas conv frontend: exact vs the per-layer XLA extractor
(interpret mode on CPU), gradient safety through the custom VJP, dispatch
predicate."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.models.wav2vec2 import (ConvFeatureExtractor,
                                                 Wav2Vec2Config)
from svt_speechbrain_tpu.ops.conv_frontend import (can_fuse,
                                                   fused_conv_frontend,
                                                   fused_conv_frontend_vjp)


@pytest.fixture(scope="module")
def setup():
    fe = ConvFeatureExtractor(Wav2Vec2Config.large_lv60())
    p = fe.init(jax.random.PRNGKey(0))
    wav = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16000)),
                      jnp.float32)
    return fe, p, wav


def test_fused_matches_xla_extractor(setup):
    fe, p, wav = setup
    ref = np.asarray(fe(p, wav, fused=False))
    got = np.asarray(fused_conv_frontend(p, wav, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)
    # ragged length (not a tile multiple of frames)
    wav2 = wav[:, :13731]
    ref2 = np.asarray(fe(p, wav2, fused=False))
    got2 = np.asarray(fused_conv_frontend(p, wav2, interpret=True))
    assert got2.shape == ref2.shape
    np.testing.assert_allclose(got2, ref2, atol=2e-5)


def test_fused_vjp_matches_xla_grads(setup):
    """The custom VJP's recompute backward equals autodiff through the
    XLA path (kernel interpret mode runs off-TPU inside the fwd)."""
    fe, p, wav = setup

    def loss_fused(pp):
        return jnp.sum(jnp.square(fused_conv_frontend_vjp(pp, wav)))

    def loss_xla(pp):
        return jnp.sum(jnp.square(fe(pp, wav, fused=False)))

    g_fused = jax.grad(loss_fused)(p)
    g_xla = jax.grad(loss_xla)(p)
    for a, b in zip(jax.tree_util.tree_leaves(g_fused),
                    jax.tree_util.tree_leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-3)


def test_dispatch_predicate(setup):
    fe, p, wav = setup
    cfg = Wav2Vec2Config.large_lv60()
    # CPU backend in tests → no dispatch (kernel still correct via the
    # explicit interpret call above)
    assert not can_fuse(cfg, wav)
    base = Wav2Vec2Config.base()  # group norm → never fused
    assert base.feat_extract_norm == "group"


@pytest.mark.parametrize("fold0", [4, 8, 16])
def test_fused_fold0_matches_baseline(setup, fold0):
    """The widened layer-0 contraction (docs/PERF.md residual lever) is a
    pure repack: fold0 consecutive outputs per window row, block-shifted
    weight columns — numerics identical to the unfolded kernel."""
    fe, p, wav = setup
    ref = np.asarray(fe(p, wav, fused=False))
    got = np.asarray(fused_conv_frontend(p, wav, interpret=True,
                                         fold0=fold0))
    np.testing.assert_allclose(got, ref, atol=2e-5)
    # ragged length: trailing fold groups padded past the sample end
    wav2 = wav[:, :13731]
    ref2 = np.asarray(fe(p, wav2, fused=False))
    got2 = np.asarray(fused_conv_frontend(p, wav2, interpret=True,
                                          fold0=fold0))
    assert got2.shape == ref2.shape
    np.testing.assert_allclose(got2, ref2, atol=2e-5)
