"""Source-separation models (analogue of reference
``speechbrain/lobes/models/conv_tasnet.py`` and ``dual_path.py`` /
SepFormer).

Conv-TasNet: learned encoder → TCN mask network → overlap-add decoder.
Dual-path: chunked intra/inter processing with transformer blocks
(SepFormer when both are transformers).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module, split_rngs
from svt_speechbrain_tpu.nnet.cnn import Conv1d, ConvTranspose1d
from svt_speechbrain_tpu.nnet.linear import Linear
from svt_speechbrain_tpu.nnet.normalization import LayerNorm, layer_norm
from svt_speechbrain_tpu.models.transformer import TransformerEncoder, PositionalEncoding


class TasNetEncoder(Module):
    """Waveform → latent frames via strided conv + ReLU
    (reference ``conv_tasnet.py`` Encoder / ``dual_path.py:Encoder``)."""

    def __init__(self, kernel_size=16, out_channels=256, stride=None):
        self.stride = stride or kernel_size // 2
        self.conv = Conv1d(out_channels, kernel_size, 1, stride=self.stride,
                           padding="valid", bias=False)

    def init(self, rng):
        return {"conv": self.conv.init(rng)}

    def __call__(self, params, wav):
        return jax.nn.relu(self.conv(params["conv"], wav[..., None]))


class TasNetDecoder(Module):
    """Latent frames → waveform via transposed conv (reference Decoder)."""

    def __init__(self, kernel_size=16, in_channels=256, stride=None):
        self.stride = stride or kernel_size // 2
        self.deconv = ConvTranspose1d(1, kernel_size, in_channels,
                                      stride=self.stride, bias=False)

    def init(self, rng):
        return {"deconv": self.deconv.init(rng)}

    def __call__(self, params, h):
        return self.deconv(params["deconv"], h)[..., 0]


class TemporalBlock(Module):
    """TCN block: 1x1 conv → PReLU → norm → depthwise dilated conv → 1x1
    with residual (reference ``conv_tasnet.py`` TemporalBlock)."""

    def __init__(self, channels, hidden, kernel_size, dilation):
        self.conv_in = Conv1d(hidden, 1, channels, padding="valid")
        self.dconv = Conv1d(hidden, kernel_size, hidden, dilation=dilation,
                            padding="same", padding_mode="reflect", groups=hidden)
        self.conv_out = Conv1d(channels, 1, hidden, padding="valid")
        self.norm1 = LayerNorm(hidden)
        self.norm2 = LayerNorm(hidden)

    def init(self, rng):
        k1, k2, k3 = split_rngs(rng, 3)
        return {"conv_in": self.conv_in.init(k1), "dconv": self.dconv.init(k2),
                "conv_out": self.conv_out.init(k3),
                "norm1": self.norm1.init(None), "norm2": self.norm2.init(None)}

    def __call__(self, params, x):
        h = jax.nn.relu(self.conv_in(params["conv_in"], x))
        h = self.norm1(params["norm1"], h)
        h = jax.nn.relu(self.dconv(params["dconv"], h))
        h = self.norm2(params["norm2"], h)
        return x + self.conv_out(params["conv_out"], h)


class MaskNet(Module):
    """TCN mask estimation (reference ``conv_tasnet.py`` MaskNet): stacked
    dilated blocks → per-source sigmoid masks."""

    def __init__(self, in_channels=256, bn_channels=128, hidden=512,
                 kernel_size=3, n_blocks=8, n_repeats=3, n_sources=2):
        self.n_sources = n_sources
        self.in_channels = in_channels
        self.bottleneck = Conv1d(bn_channels, 1, in_channels, padding="valid")
        self.blocks = []
        for _ in range(n_repeats):
            for b in range(n_blocks):
                self.blocks.append(TemporalBlock(bn_channels, hidden,
                                                 kernel_size, 2 ** b))
        self.mask_conv = Conv1d(n_sources * in_channels, 1, bn_channels,
                                padding="valid")

    def init(self, rng):
        keys = split_rngs(rng, len(self.blocks) + 2)
        params = {"bottleneck": self.bottleneck.init(keys[0]),
                  "mask_conv": self.mask_conv.init(keys[-1])}
        for i, blk in enumerate(self.blocks):
            params[f"block{i}"] = blk.init(keys[i + 1])
        return params

    def __call__(self, params, h):
        x = self.bottleneck(params["bottleneck"], layer_norm(h))
        for i in range(len(self.blocks)):
            x = self.blocks[i](params[f"block{i}"], x)
        masks = jax.nn.sigmoid(self.mask_conv(params["mask_conv"], x))
        b, t, _ = masks.shape
        return masks.reshape(b, t, self.n_sources, self.in_channels)


class ConvTasNet(Module):
    """Full Conv-TasNet separator: wav (B, T) → sources (B, n_src, T')."""

    def __init__(self, n_sources=2, enc_kernel=16, enc_channels=256,
                 bn_channels=128, hidden=512, n_blocks=8, n_repeats=3):
        self.encoder = TasNetEncoder(enc_kernel, enc_channels)
        self.masknet = MaskNet(enc_channels, bn_channels, hidden, 3,
                               n_blocks, n_repeats, n_sources)
        self.decoder = TasNetDecoder(enc_kernel, enc_channels)
        self.n_sources = n_sources

    def init(self, rng):
        k1, k2, k3 = split_rngs(rng, 3)
        return {"encoder": self.encoder.init(k1), "masknet": self.masknet.init(k2),
                "decoder": self.decoder.init(k3)}

    def __call__(self, params, wav):
        h = self.encoder(params["encoder"], wav)  # (B, T', C)
        masks = self.masknet(params["masknet"], h)  # (B, T', S, C)
        outs = []
        for s in range(self.n_sources):
            outs.append(self.decoder(params["decoder"], h * masks[:, :, s]))
        return jnp.stack(outs, axis=1)


class DualPathModel(Module):
    """Dual-path (SepFormer-style) mask network: chunk → intra-chunk
    transformer → inter-chunk transformer → masks
    (reference ``dual_path.py:Dual_Path_Model`` + SBTransformerBlock)."""

    def __init__(self, in_channels=256, d_model=128, n_sources=2, chunk_size=50,
                 num_layers=2, nhead=4, d_ffn=256, num_dp_blocks=2):
        self.chunk_size = chunk_size
        self.n_sources = n_sources
        self.in_channels = in_channels
        self.proj_in = Linear(d_model, in_channels)
        self.pos = PositionalEncoding(d_model)
        self.intra = [TransformerEncoder(num_layers, nhead, d_ffn, d_model=d_model)
                      for _ in range(num_dp_blocks)]
        self.inter = [TransformerEncoder(num_layers, nhead, d_ffn, d_model=d_model)
                      for _ in range(num_dp_blocks)]
        self.proj_out = Linear(n_sources * in_channels, d_model)

    def init(self, rng):
        keys = split_rngs(rng, 2 * len(self.intra) + 2)
        params = {"proj_in": self.proj_in.init(keys[0]),
                  "proj_out": self.proj_out.init(keys[-1])}
        for i, (a, e) in enumerate(zip(self.intra, self.inter)):
            params[f"intra{i}"] = a.init(keys[1 + 2 * i])
            params[f"inter{i}"] = e.init(keys[2 + 2 * i])
        return params

    def __call__(self, params, h):
        """h: (B, T, C) encoder output → (B, T, S, C) masks."""
        b, t, _ = h.shape
        cs = self.chunk_size
        pad = (-t) % cs
        x = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        x = self.proj_in(params["proj_in"], x)
        n_chunks = x.shape[1] // cs
        d = x.shape[-1]
        x = x.reshape(b, n_chunks, cs, d)
        for i in range(len(self.intra)):
            # intra-chunk: fold chunks into batch
            xi = x.reshape(b * n_chunks, cs, d)
            xi = xi + self.pos(None, xi)
            xi, _ = self.intra[i](params[f"intra{i}"], xi)
            x = xi.reshape(b, n_chunks, cs, d)
            # inter-chunk: fold positions into batch
            xo = x.transpose(0, 2, 1, 3).reshape(b * cs, n_chunks, d)
            xo = xo + self.pos(None, xo)
            xo, _ = self.inter[i](params[f"inter{i}"], xo)
            x = xo.reshape(b, cs, n_chunks, d).transpose(0, 2, 1, 3)
        x = x.reshape(b, n_chunks * cs, d)[:, :t]
        masks = jax.nn.relu(self.proj_out(params["proj_out"], x))
        return masks.reshape(b, t, self.n_sources, self.in_channels)


class SepFormer(Module):
    """Encoder + dual-path masking + decoder (reference SepformerWrapper)."""

    def __init__(self, n_sources=2, enc_kernel=16, enc_channels=256,
                 d_model=128, chunk_size=50, num_layers=2, nhead=4, d_ffn=256):
        self.encoder = TasNetEncoder(enc_kernel, enc_channels)
        self.masknet = DualPathModel(enc_channels, d_model, n_sources,
                                     chunk_size, num_layers, nhead, d_ffn)
        self.decoder = TasNetDecoder(enc_kernel, enc_channels)
        self.n_sources = n_sources

    def init(self, rng):
        k1, k2, k3 = split_rngs(rng, 3)
        return {"encoder": self.encoder.init(k1), "masknet": self.masknet.init(k2),
                "decoder": self.decoder.init(k3)}

    def __call__(self, params, wav):
        h = self.encoder(params["encoder"], wav)
        masks = self.masknet(params["masknet"], h)
        outs = [self.decoder(params["decoder"], h * masks[:, :, s])
                for s in range(self.n_sources)]
        return jnp.stack(outs, axis=1)


# Reference public names (``lobes/models/dual_path.py`` / ``conv_tasnet.py``)
Dual_Path_Model = DualPathModel
SepformerWrapper = SepFormer
Encoder = TasNetEncoder
Decoder = TasNetDecoder


def choose_norm(norm_type, channel_size):
    """Norm factory (reference ``conv_tasnet.py`` choose_norm): "gLN" global,
    "cLN" channelwise, else batch norm."""
    if norm_type == "gLN":
        return GlobalLayerNorm(channel_size)
    if norm_type == "cLN":
        return ChannelwiseLayerNorm(channel_size)
    from svt_speechbrain_tpu.nnet.normalization import BatchNorm1d

    return BatchNorm1d(channel_size)


class GlobalLayerNorm(Module):
    """gLN: statistics over (time, channels) per item with affine
    channel params (reference ``conv_tasnet.py`` GlobalLayerNorm /
    ``dual_path.py`` GlobalLayerNorm)."""

    def __init__(self, channel_size, eps=1e-8):
        self.channel_size = channel_size
        self.eps = eps

    def init(self, rng):
        del rng
        return {"scale": jnp.ones((self.channel_size,)),
                "bias": jnp.zeros((self.channel_size,))}

    def __call__(self, params, x):
        axes = tuple(range(1, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=axes, keepdims=True)
        return ((x - mean) / jnp.sqrt(var + self.eps)) * params["scale"] + params["bias"]


class ChannelwiseLayerNorm(Module):
    """cLN: per-frame statistics over channels (reference
    ``conv_tasnet.py`` ChannelwiseLayerNorm)."""

    def __init__(self, channel_size, eps=1e-8):
        self.channel_size = channel_size
        self.eps = eps

    def init(self, rng):
        del rng
        return {"scale": jnp.ones((self.channel_size,)),
                "bias": jnp.zeros((self.channel_size,))}

    def __call__(self, params, x):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        return ((x - mean) / jnp.sqrt(var + self.eps)) * params["scale"] + params["bias"]


CumulativeLayerNorm = ChannelwiseLayerNorm


class SBTransformerBlock(Module):
    """Pluggable intra/inter transformer block for dual-path models
    (reference ``dual_path.py`` SBTransformerBlock)."""

    def __init__(self, num_layers, d_model, nhead, d_ffn=2048,
                 use_positional_encoding=False):
        self.encoder = TransformerEncoder(num_layers, nhead, d_ffn,
                                          d_model=d_model)
        self.pos = (PositionalEncoding(d_model)
                    if use_positional_encoding else None)

    def init(self, rng):
        return {"encoder": self.encoder.init(rng)}

    def __call__(self, params, x):
        if self.pos is not None:
            x = x + self.pos(None, x)
        out = self.encoder(params["encoder"], x)
        return out[0] if isinstance(out, tuple) else out


class SBRNNBlock(Module):
    """Pluggable RNN block for dual-path models
    (reference ``dual_path.py`` SBRNNBlock): bidirectional RNN + linear
    projection back to the model width."""

    def __init__(self, input_size, hidden_channels, num_layers=1,
                 rnn_type="lstm", bidirectional=True):
        from svt_speechbrain_tpu.nnet.rnn import GRU, LSTM

        cls = {"lstm": LSTM, "gru": GRU}[rnn_type.lower()]
        self.rnn = cls(hidden_channels, input_size=input_size,
                       num_layers=num_layers, bidirectional=bidirectional)
        width = hidden_channels * (2 if bidirectional else 1)
        self.proj = Linear(input_size, width)

    def init(self, rng):
        k1, k2 = split_rngs(rng, 2)
        return {"rnn": self.rnn.init(k1), "proj": self.proj.init(k2)}

    def __call__(self, params, x):
        out, _ = self.rnn(params["rnn"], x)
        return self.proj(params["proj"], out)


class Chomp1d(Module):
    """Trim trailing frames added by causal padding
    (reference ``conv_tasnet.py:Chomp1d``)."""

    def __init__(self, chomp_size):
        self.chomp_size = chomp_size

    def __call__(self, params, x):
        del params
        return x[:, :-self.chomp_size] if self.chomp_size else x


class TemporalBlocksSequential(Module):
    """The TCN stack as its own module (reference
    ``conv_tasnet.py:TemporalBlocksSequential``): n_repeats × n_blocks
    dilated TemporalBlocks."""

    def __init__(self, channels, hidden, kernel_size=3, n_blocks=8,
                 n_repeats=3):
        self.blocks = [TemporalBlock(channels, hidden, kernel_size, 2 ** b)
                       for _ in range(n_repeats) for b in range(n_blocks)]

    def init(self, rng):
        keys = split_rngs(rng, len(self.blocks))
        return {str(i): b.init(k) for i, (b, k) in enumerate(zip(self.blocks, keys))}

    def __call__(self, params, x):
        for i, blk in enumerate(self.blocks):
            x = blk(params[str(i)], x)
        return x


class IdentityBlock(Module):
    """No-op intra/inter block (reference ``dual_path.py:IdentityBlock``)."""

    def init(self, rng):
        del rng
        return {}

    def __call__(self, params, x, *a, **kw):
        del params
        return x


class DPTNetBlock(Module):
    """DPT-Net style block: self-attention + RNN feed-forward
    (reference ``dual_path.py:DPTNetBlock``)."""

    def __init__(self, d_model, nhead, dim_feedforward=256, dropout=0.0):
        from svt_speechbrain_tpu.nnet.attention import MultiheadAttention
        from svt_speechbrain_tpu.nnet.normalization import LayerNorm
        from svt_speechbrain_tpu.nnet.rnn import GRU

        self.attn = MultiheadAttention(nhead, d_model, dropout=dropout)
        self.rnn = GRU(dim_feedforward, input_size=d_model)
        self.proj = Linear(d_model, dim_feedforward)
        self.norm1 = LayerNorm(d_model)
        self.norm2 = LayerNorm(d_model)

    def init(self, rng):
        k1, k2, k3 = split_rngs(rng, 3)
        return {"attn": self.attn.init(k1), "rnn": self.rnn.init(k2),
                "proj": self.proj.init(k3), "norm1": self.norm1.init(None),
                "norm2": self.norm2.init(None)}

    def __call__(self, params, x):
        a = self.attn(params["attn"], x, x, x, return_attn_weights=False)
        x = self.norm1(params["norm1"], x + a)
        h, _ = self.rnn(params["rnn"], x)
        h = self.proj(params["proj"], jax.nn.relu(h))
        return self.norm2(params["norm2"], x + h)


class FastTransformerBlock(Module):
    """The reference wraps the ``fast_transformers`` library
    (``dual_path.py:FastTransformerBlock``), which is CUDA-only and not
    installed here; use ``SBTransformerBlock`` (XLA fuses dense attention on
    TPU — the "fast" kernels target GPU memory patterns)."""

    def __init__(self, *a, **kw):
        raise ImportError(
            "fast_transformers is GPU-specific and not available; "
            "use SBTransformerBlock on TPU")


class Dual_Computation_Block(Module):
    """One dual-path step over chunked input (B, n_chunks, chunk, d):
    intra-chunk block + inter-chunk block with residuals
    (reference ``dual_path.py:Dual_Computation_Block``)."""

    def __init__(self, intra_mdl, inter_mdl, skip_around_intra=True):
        self.intra = intra_mdl
        self.inter = inter_mdl
        self.skip_around_intra = skip_around_intra

    def init(self, rng):
        k1, k2 = split_rngs(rng, 2)
        return {"intra": self.intra.init(k1), "inter": self.inter.init(k2)}

    def __call__(self, params, x):
        b, n_chunks, cs, d = x.shape
        intra = self.intra(params["intra"], x.reshape(b * n_chunks, cs, d))
        intra = intra.reshape(b, n_chunks, cs, d)
        if self.skip_around_intra:
            intra = intra + x
        swapped = jnp.swapaxes(intra, 1, 2).reshape(b * cs, n_chunks, d)
        inter = self.inter(params["inter"], swapped)
        inter = jnp.swapaxes(inter.reshape(b, cs, n_chunks, d), 1, 2)
        return inter + intra


# Reference public names (``dual_path.py`` / ``conv_tasnet.py``)
select_norm = choose_norm
PytorchTransformerBlock = SBTransformerBlock
PyTorchPositionalEncoding = PositionalEncoding

from svt_speechbrain_tpu.nnet.cnn import DepthwiseSeparableConv1d as DepthwiseSeparableConv  # noqa: E402,F401
