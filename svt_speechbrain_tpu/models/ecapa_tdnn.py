"""ECAPA-TDNN speaker embedding model (analogue of reference
``speechbrain/lobes/models/ECAPA_TDNN.py``): Res2Net TDNN blocks with
squeeze-excitation, multi-layer feature aggregation and attentive statistics
pooling."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module, split_rngs
from svt_speechbrain_tpu.nnet.cnn import Conv1d
from svt_speechbrain_tpu.nnet.linear import Linear
from svt_speechbrain_tpu.nnet.normalization import BatchNorm1d


class TDNNBlock(Module):
    """Conv1d + ReLU + BatchNorm1d (reference ``ECAPA_TDNN.py:40``; running
    statistics live in the state tree)."""

    def __init__(self, in_channels, out_channels, kernel_size, dilation):
        self.conv = Conv1d(out_channels, kernel_size, in_channels,
                           dilation=dilation, padding="same",
                           padding_mode="reflect")
        self.norm = BatchNorm1d(out_channels)

    def init(self, rng):
        return {"conv": self.conv.init(rng), "norm": self.norm.init(None)}

    def init_state(self):
        return self.norm.init_state()

    def __call__(self, params, x, state, train=False):
        return self.norm(params["norm"],
                         state, jax.nn.relu(self.conv(params["conv"], x)),
                         train=train)


class Res2NetBlock(Module):
    """Hierarchical multi-scale convolutions (reference ``ECAPA_TDNN.py:86``)."""

    def __init__(self, in_channels, out_channels, scale=8, kernel_size=3, dilation=1):
        assert in_channels % scale == 0 and out_channels % scale == 0
        self.scale = scale
        in_c = in_channels // scale
        hid = out_channels // scale
        self.blocks = [TDNNBlock(in_c, hid, kernel_size, dilation)
                       for _ in range(scale - 1)]

    def init(self, rng):
        keys = split_rngs(rng, len(self.blocks))
        return {str(i): b.init(k) for i, (b, k) in enumerate(zip(self.blocks, keys))}

    def init_state(self):
        return {str(i): b.init_state() for i, b in enumerate(self.blocks)}

    def __call__(self, params, x, state, train=False):
        chunks = jnp.split(x, self.scale, axis=-1)
        outs = [chunks[0]]
        new_state = {}
        y = None
        for i, chunk in enumerate(chunks[1:]):
            inp = chunk if i == 0 else chunk + y
            y, new_state[str(i)] = self.blocks[i](params[str(i)], inp,
                                                  state[str(i)], train=train)
            outs.append(y)
        return jnp.concatenate(outs, axis=-1), new_state


class SEBlock(Module):
    """Squeeze-excitation over channels (reference ``ECAPA_TDNN.py:146``)."""

    def __init__(self, in_channels, se_channels, out_channels):
        self.conv1 = Conv1d(se_channels, 1, in_channels, padding="valid")
        self.conv2 = Conv1d(out_channels, 1, se_channels, padding="valid")

    def init(self, rng):
        k1, k2 = split_rngs(rng, 2)
        return {"conv1": self.conv1.init(k1), "conv2": self.conv2.init(k2)}

    def __call__(self, params, x, lengths=None):
        if lengths is not None:
            t = x.shape[1]
            n = jnp.clip(jnp.round(jnp.asarray(lengths) * t), 1, t)
            mask = (jnp.arange(t)[None, :, None] < n[:, None, None]).astype(x.dtype)
            s = jnp.sum(x * mask, axis=1, keepdims=True) / n[:, None, None]
        else:
            s = jnp.mean(x, axis=1, keepdims=True)
        s = jax.nn.relu(self.conv1(params["conv1"], s))
        s = jax.nn.sigmoid(self.conv2(params["conv2"], s))
        return x * s


class AttentiveStatisticsPooling(Module):
    """Attention-weighted mean+std pooling (reference ``ECAPA_TDNN.py:204``)."""

    def __init__(self, channels, attention_channels=128, global_context=True):
        self.global_context = global_context
        in_c = channels * 3 if global_context else channels
        self.tdnn = TDNNBlock(in_c, attention_channels, 1, 1)
        self.conv = Conv1d(channels, 1, attention_channels, padding="valid")
        self.eps = 1e-12

    def init(self, rng):
        k1, k2 = split_rngs(rng, 2)
        return {"tdnn": self.tdnn.init(k1), "conv": self.conv.init(k2)}

    def init_state(self):
        return self.tdnn.init_state()

    def __call__(self, params, x, state, lengths=None, train=False):
        t = x.shape[1]
        if lengths is None:
            lengths = jnp.ones((x.shape[0],))
        n = jnp.clip(jnp.round(jnp.asarray(lengths) * t), 1, t)
        mask = (jnp.arange(t)[None, :, None] < n[:, None, None]).astype(x.dtype)

        def masked_stats(x, w):
            mean = jnp.sum(x * w, axis=1, keepdims=True)
            std = jnp.sqrt(jnp.sum(jnp.square(x - mean) * w, axis=1, keepdims=True)
                           + self.eps)
            return mean, std

        if self.global_context:
            w0 = mask / n[:, None, None]
            mean, std = masked_stats(x, w0)
            attn_in = jnp.concatenate(
                [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)],
                axis=-1)
        else:
            attn_in = x
        h, new_state = self.tdnn(params["tdnn"], attn_in, state, train=train)
        attn = self.conv(params["conv"], jnp.tanh(h))
        attn = jnp.where(mask > 0, attn, -1e30)
        attn = jax.nn.softmax(attn, axis=1)
        mean, std = masked_stats(x, attn)
        pooled = jnp.concatenate([mean[:, 0], std[:, 0]], axis=-1)[:, None, :]
        return pooled, new_state


class SERes2NetBlock(Module):
    """TDNN → Res2Net → TDNN → SE with residual (reference ``ECAPA_TDNN.py:284``)."""

    def __init__(self, in_channels, out_channels, res2net_scale=8, se_channels=128,
                 kernel_size=1, dilation=1):
        self.tdnn1 = TDNNBlock(in_channels, out_channels, 1, 1)
        self.res2net = Res2NetBlock(out_channels, out_channels, res2net_scale,
                                    kernel_size, dilation)
        self.tdnn2 = TDNNBlock(out_channels, out_channels, 1, 1)
        self.se = SEBlock(out_channels, se_channels, out_channels)
        self.shortcut = (Conv1d(out_channels, 1, in_channels, padding="valid")
                         if in_channels != out_channels else None)

    def init(self, rng):
        keys = split_rngs(rng, 5)
        params = {"tdnn1": self.tdnn1.init(keys[0]),
                  "res2net": self.res2net.init(keys[1]),
                  "tdnn2": self.tdnn2.init(keys[2]),
                  "se": self.se.init(keys[3])}
        if self.shortcut is not None:
            params["shortcut"] = self.shortcut.init(keys[4])
        return params

    def init_state(self):
        return {"tdnn1": self.tdnn1.init_state(),
                "res2net": self.res2net.init_state(),
                "tdnn2": self.tdnn2.init_state()}

    def __call__(self, params, x, state, lengths=None, train=False):
        residual = x
        if self.shortcut is not None:
            residual = self.shortcut(params["shortcut"], x)
        new_state = {}
        y, new_state["tdnn1"] = self.tdnn1(params["tdnn1"], x,
                                           state["tdnn1"], train=train)
        y, new_state["res2net"] = self.res2net(params["res2net"], y,
                                               state["res2net"], train=train)
        y, new_state["tdnn2"] = self.tdnn2(params["tdnn2"], y,
                                           state["tdnn2"], train=train)
        y = self.se(params["se"], y, lengths)
        return y + residual, new_state


class ECAPA_TDNN(Module):
    """Full ECAPA-TDNN embedding model (reference ``ECAPA_TDNN.py:324``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> model = ECAPA_TDNN(input_size=24, lin_neurons=32,
    ...                    channels=(32, 32, 32, 32, 96),
    ...                    attention_channels=16, res2net_scale=4,
    ...                    se_channels=16)
    >>> params = model.init(jax.random.PRNGKey(0))
    >>> out = model(params, jnp.ones((2, 40, 24)))
    >>> out.shape
    (2, 1, 32)
    """

    def __init__(self, input_size, lin_neurons=192, channels=(512, 512, 512, 512, 1536),
                 kernel_sizes=(5, 3, 3, 3, 1), dilations=(1, 2, 3, 4, 1),
                 attention_channels=128, res2net_scale=8, se_channels=128,
                 global_context=True):
        self.block0 = TDNNBlock(input_size, channels[0], kernel_sizes[0], dilations[0])
        self.blocks = [
            SERes2NetBlock(channels[i - 1], channels[i], res2net_scale, se_channels,
                           kernel_sizes[i], dilations[i])
            for i in range(1, len(channels) - 1)
        ]
        self.mfa = TDNNBlock(channels[-2] * len(self.blocks), channels[-1],
                             kernel_sizes[-1], dilations[-1])
        self.asp = AttentiveStatisticsPooling(channels[-1], attention_channels,
                                              global_context)
        self.asp_norm = BatchNorm1d(channels[-1] * 2)
        self.fc = Conv1d(lin_neurons, 1, channels[-1] * 2, padding="valid")

    def init(self, rng):
        keys = split_rngs(rng, len(self.blocks) + 4)
        params = {"block0": self.block0.init(keys[0]),
                  "mfa": self.mfa.init(keys[-3]),
                  "asp": self.asp.init(keys[-2]),
                  "asp_norm": self.asp_norm.init(None),
                  "fc": self.fc.init(keys[-1])}
        for i, b in enumerate(self.blocks):
            params[f"block{i + 1}"] = b.init(keys[i + 1])
        return params

    def init_state(self):
        return {"block0": self.block0.init_state(),
                "mfa": self.mfa.init_state(),
                "asp": self.asp.init_state(),
                "asp_norm": self.asp_norm.init_state(),
                **{f"block{i + 1}": b.init_state()
                   for i, b in enumerate(self.blocks)}}

    def __call__(self, params, x, lengths=None, state=None, train=False):
        """x: (B, T, F) → (B, 1, lin_neurons). With ``state`` (running BN
        statistics) returns ``(emb, new_state)``; without, returns ``emb``
        (train mode uses batch statistics like torch)."""
        return_state = state is not None
        if state is None:
            state = self.init_state()
        new_state = {}
        h, new_state["block0"] = self.block0(params["block0"], x,
                                             state["block0"], train=train)
        outs = []
        for i, b in enumerate(self.blocks):
            h, new_state[f"block{i + 1}"] = b(
                params[f"block{i + 1}"], h, state[f"block{i + 1}"],
                lengths=lengths, train=train)
            outs.append(h)
        h = jnp.concatenate(outs, axis=-1)
        h, new_state["mfa"] = self.mfa(params["mfa"], h, state["mfa"],
                                       train=train)
        h, new_state["asp"] = self.asp(params["asp"], h, state["asp"],
                                       lengths=lengths, train=train)
        h, new_state["asp_norm"] = self.asp_norm(
            params["asp_norm"], state["asp_norm"], h, train=train)
        emb = self.fc(params["fc"], h)
        if return_state:
            return emb, new_state
        return emb


class Classifier(Module):
    """Cosine-similarity classifier head for speaker id
    (reference ``ECAPA_TDNN.py:400``)."""

    def __init__(self, input_size, lin_neurons=192, out_neurons=1211):
        self.fc = Linear(lin_neurons, input_size)
        self.out_neurons = out_neurons
        self.lin_neurons = lin_neurons

    def init(self, rng):
        k1, k2 = split_rngs(rng, 2)
        from svt_speechbrain_tpu.nnet.core import glorot_uniform

        return {"fc": self.fc.init(k1),
                "weight": glorot_uniform(k2, (self.out_neurons, self.lin_neurons))}

    def __call__(self, params, x):
        x = self.fc(params["fc"], x)
        x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-9)
        w = params["weight"]
        w = w / (jnp.linalg.norm(w, axis=-1, keepdims=True) + 1e-9)
        return jnp.matmul(x, w.T)
