"""Speech-enhancement models (analogue of reference
``speechbrain/lobes/models/MetricGAN.py`` and ``segan_model.py``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module, split_rngs
from svt_speechbrain_tpu.nnet.cnn import Conv1d, Conv2d, ConvTranspose1d
from svt_speechbrain_tpu.nnet.linear import Linear
from svt_speechbrain_tpu.nnet.rnn import LSTM


class EnhancementGenerator(Module):
    """MetricGAN generator: BLSTM → linear mask with learnable sigmoid
    (reference ``MetricGAN.py`` EnhancementGenerator).

    Example
    -------
    >>> import jax, jax.numpy as jnp, numpy as np
    >>> g = EnhancementGenerator(input_size=8, hidden_size=6, num_layers=1)
    >>> params = g.init(jax.random.PRNGKey(0))
    >>> mask = g(params, jnp.ones((2, 5, 8)))
    >>> mask.shape
    (2, 5, 8)
    >>> bool(((np.asarray(mask) >= 0) & (np.asarray(mask) <= 1)).all())
    True
    """

    def __init__(self, input_size=257, hidden_size=200, num_layers=2, dropout=0.0):
        self.blstm = LSTM(hidden_size, input_size=input_size,
                          num_layers=num_layers, bidirectional=True,
                          dropout=dropout)
        self.linear1 = Linear(300, hidden_size * 2)
        self.linear2 = Linear(input_size, 300)

    def init(self, rng):
        k1, k2, k3 = split_rngs(rng, 3)
        return {"blstm": self.blstm.init(k1), "linear1": self.linear1.init(k2),
                "linear2": self.linear2.init(k3),
                "sigmoid_beta": jnp.ones(())}

    def __call__(self, params, x, lengths=None, rng=None, train=False):
        h, _ = self.blstm(params["blstm"], x, rng=rng, train=train)
        h = jax.nn.leaky_relu(self.linear1(params["linear1"], h), 0.3)
        mask = self.linear2(params["linear2"], h)
        return jax.nn.sigmoid(params["sigmoid_beta"] * mask)


class MetricDiscriminator(Module):
    """MetricGAN discriminator: CNN over (noisy, enhanced) spectrogram pairs
    predicting the target metric (reference ``MetricGAN.py`` Discriminator)."""

    def __init__(self, in_channels=2, channels=15, kernel_size=5):
        self.convs = [Conv2d(channels, kernel_size, in_channels, padding="valid")]
        for _ in range(3):
            self.convs.append(Conv2d(channels, kernel_size, channels, padding="valid"))
        self.lin1 = Linear(50, channels)
        self.lin2 = Linear(10, 50)
        self.lin3 = Linear(1, 10)

    def init(self, rng):
        keys = split_rngs(rng, len(self.convs) + 3)
        params = {f"conv{i}": c.init(keys[i]) for i, c in enumerate(self.convs)}
        params["lin1"] = self.lin1.init(keys[-3])
        params["lin2"] = self.lin2.init(keys[-2])
        params["lin3"] = self.lin3.init(keys[-1])
        return params

    def __call__(self, params, x):
        """x: (B, T, F, 2) stacked (enhanced, clean) magnitudes → (B, 1)."""
        h = x
        for i in range(len(self.convs)):
            h = jax.nn.leaky_relu(self.convs[i](params[f"conv{i}"], h), 0.3)
        h = jnp.mean(h, axis=(1, 2))  # global average pool
        h = jax.nn.leaky_relu(self.lin1(params["lin1"], h), 0.3)
        h = jax.nn.leaky_relu(self.lin2(params["lin2"], h), 0.3)
        return self.lin3(params["lin3"], h)


class SeganGenerator(Module):
    """SEGAN generator: strided conv encoder + skip-connected transposed-conv
    decoder over raw waveforms (reference ``segan_model.py`` Generator)."""

    def __init__(self, kernel_size=32, channels=(16, 32, 64), latent_dim=64):
        self.enc = []
        in_ch = 1
        for ch in channels:
            self.enc.append(Conv1d(ch, kernel_size, in_ch, stride=2, padding="same"))
            in_ch = ch
        self.dec = []
        dec_channels = list(channels[-2::-1]) + [1]
        for i, ch in enumerate(dec_channels):
            in_c = in_ch * 2 if i > 0 else in_ch
            self.dec.append(ConvTranspose1d(ch, kernel_size, in_c, stride=2,
                                            padding=kernel_size // 2 - 1,
                                            output_padding=0))
            in_ch = ch

    def init(self, rng):
        keys = split_rngs(rng, len(self.enc) + len(self.dec))
        params = {}
        for i, c in enumerate(self.enc):
            params[f"enc{i}"] = c.init(keys[i])
        for i, c in enumerate(self.dec):
            params[f"dec{i}"] = c.init(keys[len(self.enc) + i])
        return params

    def __call__(self, params, wav):
        h = wav[..., None]
        skips = []
        for i in range(len(self.enc)):
            h = jax.nn.leaky_relu(self.enc[i](params[f"enc{i}"], h), 0.3)
            skips.append(h)
        for i in range(len(self.dec)):
            if i > 0:
                skip = skips[len(self.enc) - 1 - i]
                t = min(h.shape[1], skip.shape[1])
                h = jnp.concatenate([h[:, :t], skip[:, :t]], axis=-1)
            h = self.dec[i](params[f"dec{i}"], h)
            if i < len(self.dec) - 1:
                h = jax.nn.leaky_relu(h, 0.3)
        return jnp.tanh(h[..., 0])


class SeganDiscriminator(Module):
    """SEGAN discriminator over (clean|enhanced, noisy) waveform pairs."""

    def __init__(self, kernel_size=32, channels=(16, 32, 64)):
        self.convs = []
        in_ch = 2
        for ch in channels:
            self.convs.append(Conv1d(ch, kernel_size, in_ch, stride=2, padding="same"))
            in_ch = ch
        self.out = Linear(1, in_ch)

    def init(self, rng):
        keys = split_rngs(rng, len(self.convs) + 1)
        params = {f"conv{i}": c.init(keys[i]) for i, c in enumerate(self.convs)}
        params["out"] = self.out.init(keys[-1])
        return params

    def __call__(self, params, pair):
        """pair: (B, T, 2) stacked waveforms → (B, 1)."""
        h = pair
        for i in range(len(self.convs)):
            h = jax.nn.leaky_relu(self.convs[i](params[f"conv{i}"], h), 0.3)
        return self.out(params["out"], jnp.mean(h, axis=1))


class MetricGAN_U_Discriminator(MetricDiscriminator):
    """MetricGAN-U discriminator (reference ``MetricGAN_U.py``): scores a
    SINGLE (possibly enhanced) spectrogram against an unsupervised target
    metric — same CNN trunk with a 1-channel input."""

    def __init__(self, channels=15, kernel_size=5):
        super().__init__(in_channels=1, channels=channels, kernel_size=kernel_size)

    def __call__(self, params, spec):
        # spec: (B, T, F) → (B, T, F, 1)
        return super().__call__(params, spec[..., None])


def shifted_sigmoid(x):
    """MetricGAN's rescaled sigmoid (reference ``MetricGAN.py:30``)."""
    return 1.2 / (1 + jnp.exp(-(1 / 1.6) * x))


class Learnable_sigmoid(Module):
    """Per-feature learnable-slope sigmoid scaled to (0, 1.2)
    (reference ``MetricGAN.py:34``)."""

    def __init__(self, in_features=257):
        self.in_features = in_features

    def init(self, rng):
        del rng
        return {"slope": jnp.ones((self.in_features,))}

    def __call__(self, params, x):
        return 1.2 * jax.nn.sigmoid(params["slope"] * x)


def d1_loss(d_outputs, reduction="mean"):
    """SEGAN discriminator loss on clean inputs (reference
    ``segan_model.py:195``)."""
    out = 0.5 * jnp.square(d_outputs - 1.0)
    if reduction == "mean":
        return jnp.mean(out)
    return jnp.mean(out.reshape(out.shape[0], -1), axis=1)


def d2_loss(d_outputs, reduction="mean"):
    """SEGAN discriminator loss on enhanced inputs (reference
    ``segan_model.py:204``)."""
    out = 0.5 * jnp.square(d_outputs)
    if reduction == "mean":
        return jnp.mean(out)
    return jnp.mean(out.reshape(out.shape[0], -1), axis=1)


def g3_loss(d_outputs, predictions, targets, length=None, l1LossCoeff=100.0,
            klLossCoeff=0.0, z_mean=None, z_logvar=None, reduction="mean"):
    """SEGAN generator loss: adversarial + L1 (+ optional VAE KL)
    (reference ``segan_model.py:213``)."""
    discrimloss = 0.5 * jnp.square(d_outputs - 1.0)
    l1norm = jnp.abs(predictions - targets)
    if z_mean is not None:
        var = jnp.exp(z_logvar)
        kl = 0.5 * (var + jnp.square(z_mean) - 1.0 - z_logvar)
        kl = jnp.mean(jnp.sum(kl, axis=tuple(range(1, kl.ndim))))
    else:
        kl = 0.0
    if reduction == "mean":
        return (jnp.mean(discrimloss) + l1LossCoeff * jnp.mean(l1norm)
                + klLossCoeff * kl)
    dl = jnp.mean(discrimloss.reshape(discrimloss.shape[0], -1), axis=1)
    ll = jnp.mean(l1norm.reshape(l1norm.shape[0], -1), axis=1)
    return dl + l1LossCoeff * ll + klLossCoeff * kl


def xavier_init_layer(rng, in_size, out_size):
    """Glorot-initialized linear params dict (the reference's
    ``xavier_init_layer`` initializes torch layers in place,
    ``MetricGAN.py:19``)."""
    from svt_speechbrain_tpu.nnet.core import glorot_uniform

    return {"w": glorot_uniform(rng, (in_size, out_size)),
            "b": jnp.zeros((out_size,))}


# Reference public name (``segan_model.py:Generator``)
Generator = SeganGenerator
