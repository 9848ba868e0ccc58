"""ContextNet/ESPnetVGG, Conv-TasNet/SepFormer, MetricGAN/SEGAN, NMF,
SI-SNR losses."""
import numpy as np

import jax
import jax.numpy as jnp


def test_contextnet_and_espnetvgg():
    from svt_speechbrain_tpu.models.contextnet import ContextNet, ESPnetVGG

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 20, 40)), jnp.float32)
    net = ContextNet(input_size=40, out_channels=64,
                     conv_channels=[32, 32, 64], num_blocks=3, num_layers=1)
    params = net.init(jax.random.PRNGKey(0))
    out = net(params, x)
    assert out.shape == (2, 20, 64)

    vgg = ESPnetVGG(input_size=40, vgg_channels=(8, 16), rnn_neurons=24,
                    rnn_layers=1)
    vp = vgg.init(jax.random.PRNGKey(1))
    out = vgg(vp, x)
    assert out.shape == (2, 5, 48)  # T/4 after two 2x poolings, bi-LSTM 2*24


def test_conv_tasnet_separates_shapes():
    from svt_speechbrain_tpu.models.separation import ConvTasNet

    model = ConvTasNet(n_sources=2, enc_kernel=16, enc_channels=32,
                       bn_channels=16, hidden=32, n_blocks=2, n_repeats=1)
    params = model.init(jax.random.PRNGKey(0))
    wav = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4000)), jnp.float32)
    out = model(params, wav)
    assert out.shape[0] == 2 and out.shape[1] == 2
    assert abs(out.shape[2] - 4000) <= 16


def test_sepformer_shapes():
    from svt_speechbrain_tpu.models.separation import SepFormer

    model = SepFormer(n_sources=2, enc_kernel=16, enc_channels=32, d_model=16,
                      chunk_size=10, num_layers=1, nhead=4, d_ffn=32)
    params = model.init(jax.random.PRNGKey(0))
    wav = jnp.asarray(np.random.default_rng(1).normal(size=(1, 2000)), jnp.float32)
    out = model(params, wav)
    assert out.shape[0] == 1 and out.shape[1] == 2
    assert np.isfinite(np.asarray(out)).all()


def test_metricgan_and_segan():
    from svt_speechbrain_tpu.models.enhancement import (
        EnhancementGenerator, MetricDiscriminator, SeganGenerator, SeganDiscriminator,
    )

    gen = EnhancementGenerator(input_size=65, hidden_size=16, num_layers=1)
    gp = gen.init(jax.random.PRNGKey(0))
    spec = jnp.asarray(np.random.default_rng(0).random((2, 30, 65)), jnp.float32)
    mask = gen(gp, spec)
    assert mask.shape == spec.shape
    assert float(mask.min()) >= 0 and float(mask.max()) <= 1

    disc = MetricDiscriminator()
    dp = disc.init(jax.random.PRNGKey(1))
    score = disc(dp, jnp.stack([spec, spec], axis=-1))
    assert score.shape == (2, 1)

    sg = SeganGenerator(kernel_size=16, channels=(8, 16))
    sgp = sg.init(jax.random.PRNGKey(2))
    wav = jnp.asarray(np.random.default_rng(2).normal(size=(1, 1024)), jnp.float32)
    out = sg(sgp, wav)
    assert out.ndim == 2 and out.shape[0] == 1

    sd = SeganDiscriminator(kernel_size=16, channels=(8, 16))
    sdp = sd.init(jax.random.PRNGKey(3))
    t = min(out.shape[1], wav.shape[1])
    verdict = sd(sdp, jnp.stack([out[:, :t], wav[:, :t]], axis=-1))
    assert verdict.shape == (1, 1)


def test_nmf_reconstruction():
    from svt_speechbrain_tpu.processing.nmf import nmf_factorize, separate_sources

    rng = np.random.default_rng(0)
    W_true = rng.random((32, 4))
    H_true = rng.random((4, 50))
    V = W_true @ H_true
    W, H = nmf_factorize(V, rank=4, n_iter=200)
    rec = W @ H
    assert np.abs(rec - V).mean() / V.mean() < 0.1

    V1, V2 = separate_sources(V, W[:, :2], W[:, 2:], n_iter=50)
    np.testing.assert_allclose(V1 + V2, V, rtol=1e-3)


def test_si_snr_loss():
    from svt_speechbrain_tpu.nnet.losses import get_si_snr_with_pitwrapper

    rng = np.random.default_rng(0)
    src = rng.normal(size=(2, 1000, 2)).astype(np.float32)
    # perfect estimate → very negative -si-snr
    loss_perfect = float(np.asarray(get_si_snr_with_pitwrapper(src, src)))
    noisy = src + 0.5 * rng.normal(size=src.shape).astype(np.float32)
    loss_noisy = float(np.asarray(get_si_snr_with_pitwrapper(src, noisy)))
    assert loss_perfect < loss_noisy
    # permuted sources are recovered by the PIT wrapper
    permuted = src[:, :, ::-1]
    loss_perm = float(np.asarray(get_si_snr_with_pitwrapper(src, permuted)))
    assert abs(loss_perm - loss_perfect) < 1e-3
