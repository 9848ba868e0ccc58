"""TransformerSE / TransformerST / IMU_CRNN lobes (analogues of reference
``speechbrain/lobes/models/transformer/TransformerSE.py`` /
``TransformerST.py`` and ``IMU_CRNN.py``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module, split_rngs
from svt_speechbrain_tpu.nnet.linear import Linear
from svt_speechbrain_tpu.nnet.cnn import Conv1d
from svt_speechbrain_tpu.nnet.normalization import LayerNorm
from svt_speechbrain_tpu.nnet.rnn import GRU
from svt_speechbrain_tpu.nnet.pooling import Pooling1d
from svt_speechbrain_tpu.models.transformer import TransformerEncoder, PositionalEncoding
from svt_speechbrain_tpu.models.transformer_asr import TransformerASR


class CNNTransformerSE(Module):
    """Speech-enhancement transformer: encoder stack producing a spectral
    mask (reference ``TransformerSE.py:18``).

    Example
    -------
    >>> import jax, jax.numpy as jnp, numpy as np
    >>> se = CNNTransformerSE(d_model=16, output_size=20, nhead=4,
    ...                       num_layers=1, d_ffn=32, input_size=20)
    >>> params = se.init(jax.random.PRNGKey(0))
    >>> mask = se(params, jnp.ones((2, 6, 20)))
    >>> mask.shape, bool((np.asarray(mask) >= 0).all())   # relu mask
    ((2, 6, 20), True)
    """

    def __init__(self, d_model, output_size, output_activation="relu",
                 nhead=8, num_layers=8, d_ffn=512, dropout=0.1,
                 input_size=None, causal=True):
        input_size = input_size or d_model
        self.custom_emb = Linear(d_model, input_size)
        self.pos = PositionalEncoding(d_model)
        self.encoder = TransformerEncoder(num_layers, nhead, d_ffn,
                                          d_model=d_model, dropout=dropout,
                                          normalize_before=False)
        self.output_layer = Linear(output_size, d_model)
        self.output_activation = output_activation
        self.causal = causal

    def init(self, rng):
        k1, k2, k3 = split_rngs(rng, 3)
        return {"emb": self.custom_emb.init(k1), "encoder": self.encoder.init(k2),
                "out": self.output_layer.init(k3)}

    def __call__(self, params, x, rng=None, train=False):
        h = self.custom_emb(params["emb"], x)
        h = h + self.pos(None, h)
        mask = None
        if self.causal:
            from svt_speechbrain_tpu.models.transformer import get_lookahead_mask

            mask = get_lookahead_mask(h)
        h, _ = self.encoder(params["encoder"], h, src_mask=mask, rng=rng, train=train)
        out = self.output_layer(params["out"], h)
        if self.output_activation == "relu":
            return jax.nn.relu(out)
        if self.output_activation == "sigmoid":
            return jax.nn.sigmoid(out)
        return out


class TransformerST(TransformerASR):
    """Speech-translation transformer (reference ``TransformerST.py:23``):
    the ASR architecture with an optional CTC branch over the encoder for
    auxiliary ASR supervision."""

    def __init__(self, *args, ctc_vocab=None, **kwargs):
        super().__init__(*args, **kwargs)
        d_model = self.custom_src_module.n_neurons
        self.ctc_lin = Linear(ctc_vocab, d_model) if ctc_vocab else None

    def init(self, rng):
        params = super().init(rng)
        if self.ctc_lin is not None:
            rng_ctc = jax.random.fold_in(rng, 997)
            params["ctc_lin"] = self.ctc_lin.init(rng_ctc)
        return params

    def forward_asr_ctc(self, params, encoder_out):
        if self.ctc_lin is None:
            raise ValueError("TransformerST built without a CTC branch")
        return jax.nn.log_softmax(self.ctc_lin(params["ctc_lin"], encoder_out), axis=-1)


class IMU_CRNN(Module):
    """Small conv + GRU classifier over IMU channels
    (reference ``IMU_CRNN.py``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> imu = IMU_CRNN(input_size=6, channels=(8, 16), rnn_neurons=12,
    ...                outputs=4)
    >>> params = imu.init(jax.random.PRNGKey(0))
    >>> imu(params, jnp.ones((2, 32, 6))).shape    # last-frame class logits
    (2, 4)
    """

    def __init__(self, input_size=6, channels=(32, 64), kernel_size=5,
                 rnn_neurons=64, outputs=8, pool_size=2, dropout=0.1):
        from svt_speechbrain_tpu.nnet.normalization import BatchNorm1d

        self.convs = []
        in_ch = input_size
        for ch in channels:
            self.convs.append(Conv1d(ch, kernel_size, in_ch, padding="same"))
            in_ch = ch
        # reference IMU_CRNN uses torch BatchNorm1d (running stats in state)
        self.norms = [BatchNorm1d(ch) for ch in channels]
        self.pool = Pooling1d("max", pool_size)
        self.rnn = GRU(rnn_neurons, input_size=in_ch, num_layers=1)
        self.out = Linear(outputs, rnn_neurons)

    def init(self, rng):
        keys = split_rngs(rng, len(self.convs) + 2)
        params = {"rnn": self.rnn.init(keys[-2]), "out": self.out.init(keys[-1])}
        for i, c in enumerate(self.convs):
            params[f"conv{i}"] = c.init(keys[i])
            params[f"norm{i}"] = self.norms[i].init(None)
        return params

    def init_state(self):
        return {f"norm{i}": n.init_state() for i, n in enumerate(self.norms)}

    def __call__(self, params, x, rng=None, train=False, state=None):
        return_state = state is not None
        if state is None:
            state = self.init_state()
        new_state = {}
        for i in range(len(self.convs)):
            x = jax.nn.leaky_relu(self.convs[i](params[f"conv{i}"], x))
            x, new_state[f"norm{i}"] = self.norms[i](
                params[f"norm{i}"], state[f"norm{i}"], x, train=train)
            x = self.pool(None, x)
        h, _ = self.rnn(params["rnn"], x, rng=rng, train=train)
        out = self.out(params["out"], h[:, -1])
        if return_state:
            return out, new_state
        return out


class ConvBlock(Module):
    """Conv1d → BatchNorm1d → ReLU block (reference ``IMU_CRNN.py:ConvBlock``;
    running stats in the state tree)."""

    def __init__(self, out_channels, in_channels, kernel_size=3, stride=1):
        from svt_speechbrain_tpu.nnet.cnn import Conv1d
        from svt_speechbrain_tpu.nnet.normalization import BatchNorm1d

        self.conv = Conv1d(out_channels, kernel_size, in_channels,
                           stride=stride, padding="same")
        self.norm = BatchNorm1d(out_channels)

    def init(self, rng):
        return {"conv": self.conv.init(rng), "norm": self.norm.init(None)}

    def init_state(self):
        return self.norm.init_state()

    def __call__(self, params, x, state=None, train=False):
        y = self.conv(params["conv"], x)
        st = self.norm.init_state() if state is None else state
        y, new_state = self.norm(params["norm"], st, y, train=train)
        y = jax.nn.relu(y)
        if state is None:
            return y
        return y, new_state


class IMU_CRNN_GRU(Module):
    """IMU CRNN with a GRU recurrence (reference ``IMU_CRNN.py:
    IMU_CRNN_GRU``): conv blocks → GRU → linear head."""

    def __init__(self, in_channels=6, conv_channels=(32, 64), hidden=64,
                 n_classes=2):
        from svt_speechbrain_tpu.nnet.linear import Linear
        from svt_speechbrain_tpu.nnet.rnn import GRU

        self.blocks = []
        ch = in_channels
        for c in conv_channels:
            self.blocks.append(ConvBlock(c, ch))
            ch = c
        self.rnn = GRU(hidden, input_size=ch)
        self.head = Linear(n_classes, hidden)

    def init(self, rng):
        keys = split_rngs(rng, len(self.blocks) + 2)
        params = {"rnn": self.rnn.init(keys[-2]), "head": self.head.init(keys[-1])}
        for i, b in enumerate(self.blocks):
            params[f"block{i}"] = b.init(keys[i])
        return params

    def __call__(self, params, x):
        for i, b in enumerate(self.blocks):
            x = b(params[f"block{i}"], x)
        out, _ = self.rnn(params["rnn"], x)
        return self.head(params["head"], out[:, -1])


def check_model(model, params, input_shape=(2, 100, 6)):
    """Shape-check helper (reference ``IMU_CRNN.py:check_model`` prints a
    torchsummary); returns the output shape for a dummy input."""
    import numpy as np

    x = jnp.asarray(np.zeros(input_shape, np.float32))
    return model(params, x).shape
