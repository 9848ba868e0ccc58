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
from svt_speechbrain_tpu.nnet.activations import PReLU
from svt_speechbrain_tpu.nnet.normalization import LayerNorm
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


class ConvTasNetEncoder(Module):
    """Conv-TasNet adaptive frontend (reference ``conv_tasnet.py:13``
    Encoder): strided conv over the raw waveform + ReLU. Unlike the
    dual-path :class:`TasNetEncoder` (valid padding), the reference uses
    the sb-Conv1d default "same" reflect padding, so K ≈ 2T/L + 1."""

    def __init__(self, L, N):
        self.conv = Conv1d(N, L, 1, stride=L // 2, padding="same",
                           padding_mode="reflect", bias=False)

    def init(self, rng):
        return {"conv": self.conv.init(rng)}

    def __call__(self, params, mixture):
        """(M, T) waveform → (M, K, N) nonnegative latent frames."""
        return jax.nn.relu(self.conv(params["conv"], mixture[..., None]))


class ConvTasNetDecoder(Module):
    """Conv-TasNet decoder (reference ``conv_tasnet.py:62`` Decoder):
    masked latent frames → linear basis signals → 50%-overlap-add."""

    def __init__(self, L, N):
        self.L = L
        self.basis_signals = Linear(L, N, bias=False)

    def init(self, rng):
        return {"basis_signals": self.basis_signals.init(rng)}

    def __call__(self, params, mixture_w, est_mask):
        """mixture_w (M, K, N) × est_mask (M, K, C, N) → (M, T, C)."""
        from svt_speechbrain_tpu.processing.signal_processing import \
            overlap_and_add

        source_w = mixture_w[:, :, None, :] * est_mask     # (M, K, C, N)
        source_w = jnp.transpose(source_w, (0, 2, 1, 3))   # (M, C, K, N)
        est_source = self.basis_signals(params["basis_signals"], source_w)
        est_source = overlap_and_add(est_source, self.L // 2)  # (M, C, T)
        return jnp.transpose(est_source, (0, 2, 1))


class DepthwiseSeparableConv(Module):
    """Depthwise dilated conv → PReLU → norm → pointwise conv, all
    bias-free (reference ``conv_tasnet.py:375`` DepthwiseSeparableConv).

    The reference's ``causal=True`` branch is broken in this checkout: it
    constructs ``Chomp1d(padding)`` with the *string* ``"same"`` as the
    chomp size (``conv_tasnet.py:437``), which crashes when sliced. We
    implement the evident intent with a left-padded causal conv instead.
    """

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 dilation=1, norm_type="gLN", causal=False):
        self.dconv = Conv1d(in_channels, kernel_size, in_channels,
                            stride=stride, dilation=dilation,
                            padding="causal" if causal else "same",
                            padding_mode="reflect", groups=in_channels,
                            bias=False)
        self.act = PReLU()
        self.norm = choose_norm(norm_type, in_channels)
        self.pconv = Conv1d(out_channels, 1, in_channels, bias=False)

    def init(self, rng):
        k1, k2 = split_rngs(rng, 2)
        return {"dconv": self.dconv.init(k1), "act": self.act.init(None),
                "norm": self.norm.init(None), "pconv": self.pconv.init(k2)}

    def __call__(self, params, x):
        h = self.dconv(params["dconv"], x)
        h = self.norm(params["norm"], self.act(params["act"], h))
        return self.pconv(params["pconv"], h)


class TemporalBlock(Module):
    """TCN block (reference ``conv_tasnet.py:284`` TemporalBlock):
    bias-free 1x1 conv → PReLU → gLN/cLN → depthwise-separable conv,
    with a residual connection around the whole block."""

    def __init__(self, channels, hidden, kernel_size, dilation,
                 norm_type="gLN", causal=False):
        self.conv_in = Conv1d(hidden, 1, channels, bias=False)
        self.act = PReLU()
        self.norm = choose_norm(norm_type, hidden)
        self.dsconv = DepthwiseSeparableConv(hidden, channels, kernel_size,
                                             1, dilation, norm_type, causal)

    def init(self, rng):
        k1, k2 = split_rngs(rng, 2)
        return {"conv_in": self.conv_in.init(k1), "act": self.act.init(None),
                "norm": self.norm.init(None), "dsconv": self.dsconv.init(k2)}

    def __call__(self, params, x):
        h = self.conv_in(params["conv_in"], x)
        h = self.norm(params["norm"], self.act(params["act"], h))
        return x + self.dsconv(params["dsconv"], h)


class MaskNet(Module):
    """TCN mask estimation (reference ``conv_tasnet.py:173`` MaskNet):
    cLN → bias-free bottleneck 1x1 → R×X dilated TemporalBlocks →
    bias-free mask 1x1 → relu (default) or channel-softmax masks.

    Layout: the reference takes (M, N, K) channel-first and returns
    (C, M, N, K); per this repo's channel-last convention ours takes the
    encoder's (M, K, N) directly and returns (M, K, C, N) — the numerics
    are weight-exact (``tests/test_conv_tasnet_golden.py``)."""

    def __init__(self, in_channels=256, bn_channels=128, hidden=512,
                 kernel_size=3, n_blocks=8, n_repeats=3, n_sources=2,
                 norm_type="gLN", causal=False, mask_nonlinear="relu"):
        if mask_nonlinear not in ("softmax", "relu"):
            raise ValueError("Unsupported mask non-linear function")
        self.n_sources = n_sources
        self.in_channels = in_channels
        self.mask_nonlinear = mask_nonlinear
        self.layer_norm = ChannelwiseLayerNorm(in_channels)
        self.bottleneck = Conv1d(bn_channels, 1, in_channels, bias=False)
        self.blocks = []
        for _ in range(n_repeats):
            for b in range(n_blocks):
                self.blocks.append(TemporalBlock(bn_channels, hidden,
                                                 kernel_size, 2 ** b,
                                                 norm_type, causal))
        self.mask_conv = Conv1d(n_sources * in_channels, 1, bn_channels,
                                bias=False)

    def init(self, rng):
        keys = split_rngs(rng, len(self.blocks) + 2)
        params = {"layer_norm": self.layer_norm.init(None),
                  "bottleneck": self.bottleneck.init(keys[0]),
                  "mask_conv": self.mask_conv.init(keys[-1])}
        for i, blk in enumerate(self.blocks):
            params[f"block{i}"] = blk.init(keys[i + 1])
        return params

    def __call__(self, params, h):
        """(M, K, N) latent frames → (M, K, C, N) masks."""
        x = self.layer_norm(params["layer_norm"], h)
        x = self.bottleneck(params["bottleneck"], x)
        for i in range(len(self.blocks)):
            x = self.blocks[i](params[f"block{i}"], x)
        score = self.mask_conv(params["mask_conv"], x)
        b, t, _ = score.shape
        score = score.reshape(b, t, self.n_sources, self.in_channels)
        if self.mask_nonlinear == "softmax":
            return jax.nn.softmax(score, axis=-1)
        return jax.nn.relu(score)


class ConvTasNet(Module):
    """Full Conv-TasNet separator: wav (B, T) → sources (B, n_src, T').

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> sep = ConvTasNet(n_sources=2, enc_channels=32, bn_channels=16,
    ...                  hidden=32, n_blocks=2, n_repeats=1)
    >>> params = sep.init(jax.random.PRNGKey(0))
    >>> sep(params, jnp.ones((1, 800))).shape
    (1, 2, 816)
    """

    def __init__(self, n_sources=2, enc_kernel=16, enc_channels=256,
                 bn_channels=128, hidden=512, n_blocks=8, n_repeats=3,
                 norm_type="gLN", causal=False, mask_nonlinear="relu"):
        self.encoder = ConvTasNetEncoder(enc_kernel, enc_channels)
        self.masknet = MaskNet(enc_channels, bn_channels, hidden, 3,
                               n_blocks, n_repeats, n_sources,
                               norm_type, causal, mask_nonlinear)
        self.decoder = ConvTasNetDecoder(enc_kernel, enc_channels)
        self.n_sources = n_sources

    def init(self, rng):
        k1, k2, k3 = split_rngs(rng, 3)
        return {"encoder": self.encoder.init(k1), "masknet": self.masknet.init(k2),
                "decoder": self.decoder.init(k3)}

    def __call__(self, params, wav):
        h = self.encoder(params["encoder"], wav)        # (B, K, N)
        masks = self.masknet(params["masknet"], h)      # (B, K, S, N)
        out = self.decoder(params["decoder"], h, masks)  # (B, T, S)
        return jnp.transpose(out, (0, 2, 1))


class DualComputationBlock(Module):
    """One dual-path block (reference ``dual_path.py:Dual_Computation_Block``):
    intra-chunk model (chunks folded into batch) → optional linear →
    per-item global norm → optional skip; inter-chunk model (positions
    folded into batch) → optional linear → norm → residual sum."""

    def __init__(self, intra_mdl, inter_mdl, out_channels, norm="ln",
                 skip_around_intra=True, linear_layer_after_inter_intra=True):
        self.intra_mdl = intra_mdl
        self.inter_mdl = inter_mdl
        self.skip_around_intra = skip_around_intra
        self.use_linear = linear_layer_after_inter_intra
        self.norm = norm
        if norm is not None:
            # "ln" = GroupNorm(1, N) over ALL non-batch dims with per-channel
            # affine — exactly GlobalLayerNorm in channel-last layout
            self.intra_norm = GlobalLayerNorm(out_channels, eps=1e-8)
            self.inter_norm = GlobalLayerNorm(out_channels, eps=1e-8)
        if linear_layer_after_inter_intra:
            width = getattr(intra_mdl, "output_size", out_channels)
            self.intra_linear = Linear(out_channels, width)
            width = getattr(inter_mdl, "output_size", out_channels)
            self.inter_linear = Linear(out_channels, width)

    def init(self, rng):
        k = split_rngs(rng, 4)
        params = {"intra": self.intra_mdl.init(k[0]),
                  "inter": self.inter_mdl.init(k[1])}
        if self.norm is not None:
            params["intra_norm"] = self.intra_norm.init(None)
            params["inter_norm"] = self.inter_norm.init(None)
        if self.use_linear:
            params["intra_linear"] = self.intra_linear.init(k[2])
            params["inter_linear"] = self.inter_linear.init(k[3])
        return params

    def __call__(self, params, x):
        """x: (B, S, K, d) chunked activations → same shape."""
        b, s, kk, d = x.shape
        intra = self.intra_mdl(params["intra"], x.reshape(b * s, kk, d))
        if self.use_linear:
            intra = self.intra_linear(params["intra_linear"], intra)
        intra = intra.reshape(b, s, kk, d)
        if self.norm is not None:
            intra = self.intra_norm(params["intra_norm"], intra)
        if self.skip_around_intra:
            intra = intra + x

        inter = intra.transpose(0, 2, 1, 3).reshape(b * kk, s, d)
        inter = self.inter_mdl(params["inter"], inter)
        if self.use_linear:
            inter = self.inter_linear(params["inter_linear"], inter)
        inter = inter.reshape(b, kk, s, d).transpose(0, 2, 1, 3)
        if self.norm is not None:
            inter = self.inter_norm(params["inter_norm"], inter)
        return inter + intra


class Dual_Path_Model(Module):
    """Reference-exact dual-path mask network
    (``dual_path.py:Dual_Path_Model``, channel-last): per-item global norm
    → 1x1 bottleneck → optional scaled global positional encoding →
    50%-overlap segmentation → ``num_layers`` dual blocks → PReLU → 1x1 to
    ``num_spks`` channel groups → overlap-add → tanh×sigmoid output gate →
    1x1 back to encoder channels → ReLU.

    ``__call__(params, h)`` with encoder output h (B, T, C) returns masks
    (B, T, spks, C)."""

    def __init__(self, in_channels, out_channels, intra_model, inter_model,
                 num_layers=1, norm="ln", K=200, num_spks=2,
                 skip_around_intra=True, linear_layer_after_inter_intra=True,
                 use_global_pos_enc=False, max_length=20000):
        self.num_spks = num_spks
        self.num_layers = num_layers
        self.K = K
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.norm = GlobalLayerNorm(in_channels, eps=1e-8)
        self.conv_in = Linear(out_channels, in_channels, bias=False)
        self.use_global_pos_enc = use_global_pos_enc
        if use_global_pos_enc:
            from svt_speechbrain_tpu.models.transformer import (
                PositionalEncoding)

            self.pos_enc = PositionalEncoding(out_channels, max_length)
        self.blocks = [DualComputationBlock(
            intra_model, inter_model, out_channels, norm,
            skip_around_intra, linear_layer_after_inter_intra)
            for _ in range(num_layers)]
        self.conv2d = Linear(out_channels * num_spks, out_channels)
        self.end_conv = Linear(in_channels, out_channels, bias=False)
        self.output = Linear(out_channels, out_channels)
        self.output_gate = Linear(out_channels, out_channels)

    def init(self, rng):
        keys = split_rngs(rng, self.num_layers + 5)
        params = {
            "norm": self.norm.init(None),
            "conv_in": self.conv_in.init(keys[0]),
            "conv2d": self.conv2d.init(keys[1]),
            "end_conv": self.end_conv.init(keys[2]),
            "output": self.output.init(keys[3]),
            "output_gate": self.output_gate.init(keys[4]),
            "prelu": {"alpha": jnp.asarray(0.25, jnp.float32)},
            "blocks": {str(i): blk.init(keys[5 + i])
                       for i, blk in enumerate(self.blocks)},
        }
        return params

    def _segment(self, x):
        """(B, L, d) → (B, S, K, d) 50%-overlap chunks + gap."""
        b, t, d = x.shape
        k = self.K
        p = k // 2
        gap = k - (p + t % k) % k
        x = jnp.pad(x, ((0, 0), (p, p + gap), (0, 0)))
        s1 = x[:, :-p].reshape(b, -1, k, d)
        s2 = x[:, p:].reshape(b, -1, k, d)
        return jnp.stack([s1, s2], axis=2).reshape(b, -1, k, d), gap

    def _over_add(self, x, gap):
        """(B, S, K, d) → (B, L, d) overlap-and-add."""
        b, s, k, d = x.shape
        p = k // 2
        pairs = x.reshape(b, s // 2, 2, k, d)
        a = pairs[:, :, 0].reshape(b, -1, d)[:, p:]
        c = pairs[:, :, 1].reshape(b, -1, d)[:, :-p]
        y = a + c
        if gap > 0:
            y = y[:, :-gap]
        return y

    def __call__(self, params, h):
        b, t, _ = h.shape
        x = self.norm(params["norm"], h)
        x = self.conv_in(params["conv_in"], x)
        if self.use_global_pos_enc:
            base = x
            x = self.pos_enc(None, x) + base * (self.out_channels ** 0.5)
        x, gap = self._segment(x)
        for i, blk in enumerate(self.blocks):
            x = blk(params["blocks"][str(i)], x)
        alpha = params["prelu"]["alpha"]
        x = jnp.where(x >= 0, x, alpha * x)  # shared-parameter PReLU
        x = self.conv2d(params["conv2d"], x)  # (B, S, K, spks*d)
        s_chunks, kk = x.shape[1], x.shape[2]
        x = x.reshape(b, s_chunks, kk, self.num_spks, self.out_channels)
        x = x.transpose(0, 3, 1, 2, 4).reshape(
            b * self.num_spks, s_chunks, kk, self.out_channels)
        x = self._over_add(x, gap)
        x = (jnp.tanh(self.output(params["output"], x))
             * jax.nn.sigmoid(self.output_gate(params["output_gate"], x)))
        x = self.end_conv(params["end_conv"], x)  # (B*spks, L, C_in)
        x = jax.nn.relu(x)
        x = x.reshape(b, self.num_spks, -1, self.in_channels)
        return x.transpose(0, 2, 1, 3)  # (B, T, spks, C)


class DualPathModel(Module):
    """Convenience SepFormer-style mask net: ``Dual_Path_Model`` with
    SBTransformerBlock intra/inter models (the sepformer recipe layout)."""

    def __init__(self, in_channels=256, d_model=128, n_sources=2, chunk_size=50,
                 num_layers=2, nhead=4, d_ffn=256, num_dp_blocks=2,
                 use_global_pos_enc=True):
        intra = SBTransformerBlock(num_layers, d_model, nhead, d_ffn,
                                   use_positional_encoding=True,
                                   norm_before=True)
        inter = SBTransformerBlock(num_layers, d_model, nhead, d_ffn,
                                   use_positional_encoding=True,
                                   norm_before=True)
        self.core = Dual_Path_Model(
            in_channels, d_model, intra, inter, num_layers=num_dp_blocks,
            K=chunk_size, num_spks=n_sources,
            use_global_pos_enc=use_global_pos_enc)
        self.n_sources = n_sources
        self.in_channels = in_channels

    def init(self, rng):
        return self.core.init(rng)

    def __call__(self, params, h):
        """h: (B, T, C) encoder output → (B, T, S, C) masks."""
        return self.core(params, h)


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
                 use_positional_encoding=False, norm_before=False):
        self.encoder = TransformerEncoder(num_layers, nhead, d_ffn,
                                          d_model=d_model,
                                          normalize_before=norm_before)
        self.pos = (PositionalEncoding(d_model)
                    if use_positional_encoding else None)
        self.output_size = d_model

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
        self.output_size = input_size

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
                 n_repeats=3, norm_type="gLN", causal=False):
        self.blocks = [TemporalBlock(channels, hidden, kernel_size, 2 ** b,
                                     norm_type, causal)
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
