"""Convolutional frontends for transformer ASR (analogue of reference
``speechbrain/lobes/models/convolution.py``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module, split_rngs
from svt_speechbrain_tpu.nnet.cnn import Conv1d, Conv2d
from svt_speechbrain_tpu.nnet.normalization import LayerNorm


class ConvolutionFrontEnd(Module):
    """Stack of strided conv blocks for 4x time downsampling before a
    transformer encoder (reference ``convolution.py:18``). Channel-last
    (B, T, F); each block: conv(stride on time) → norm → activation.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> fe = ConvolutionFrontEnd(input_size=40, out_channels=(8, 16, 32),
    ...                          strides=(2, 2, 1))
    >>> params = fe.init(jax.random.PRNGKey(0))
    >>> fe(params, jnp.ones((2, 16, 40))).shape   # 4x time downsampling
    (2, 4, 320)
    >>> fe.output_dim()
    320
    """

    def __init__(self, input_shape=None, input_size=None, num_blocks=3,
                 num_layers_per_block=1, out_channels=(128, 256, 512),
                 kernel_sizes=(3, 3, 3), strides=(2, 2, 1), residuals=None):
        if input_size is None and input_shape is not None:
            input_size = input_shape[-1]
        self.blocks = []
        in_ch = 1
        for b in range(num_blocks):
            layers = []
            for l in range(num_layers_per_block):
                stride = strides[b] if l == num_layers_per_block - 1 else 1
                layers.append(Conv2d(out_channels[b], kernel_sizes[b], in_ch,
                                     stride=(stride, stride), padding="same",
                                     padding_mode="reflect"))
                in_ch = out_channels[b]
            self.blocks.append(layers)
        self.norms = [LayerNorm(out_channels[b]) for b in range(num_blocks)]
        self.input_size = input_size
        self.out_channels = out_channels
        self.strides = strides

    def output_dim(self):
        f = self.input_size
        for s in self.strides:
            f = -(-f // s)
        return f * self.out_channels[-1]

    def init(self, rng):
        flat = [l for blk in self.blocks for l in blk]
        keys = split_rngs(rng, len(flat))
        params = {}
        i = 0
        for b, blk in enumerate(self.blocks):
            for l in range(len(blk)):
                params[f"b{b}l{l}"] = blk[l].init(keys[i])
                i += 1
            params[f"norm{b}"] = self.norms[b].init(None)
        return params

    def __call__(self, params, x):
        """(B, T, F) → (B, T', F'·C) downsampled features."""
        h = x[..., None]  # (B, T, F, 1)
        for b, blk in enumerate(self.blocks):
            for l in range(len(blk)):
                h = blk[l](params[f"b{b}l{l}"], h)
            h = self.norms[b](params[f"norm{b}"], h)
            h = jax.nn.gelu(h, approximate=False)
        bsz, t = h.shape[0], h.shape[1]
        return h.reshape(bsz, t, -1)
