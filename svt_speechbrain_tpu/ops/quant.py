"""Int8 post-training quantization for the serving path.

TPU v5e's MXU runs s8×s8→s32 at ~1.5× the bf16 rate as XLA compiles it
(measured honestly with `tools/int8_probe.py`: 170.7 TOP/s vs 111.3
TFLOP/s on the same scan harness; the 2× nameplate is not reached but
the 1.5× is real). Weight-only quantization (w8a16) measures at parity
with bf16 — the forward is compute-bound, so the win requires quantized
*activations* too. This module therefore implements dynamic a8w8:

- weights: symmetric per-output-channel int8 (`quantize_weight`), done
  once offline by `models/quantize.py`;
- activations: symmetric per-token (last-axis) scales computed on the
  fly inside the matmul (`int8_matmul`) — one fused VPU pass, no
  calibration data needed.

This is a deliberate capability beyond the reference (which serves in
fp16/fp32 only); the bf16 path remains the default and the parity
surface. Inference-only: gradients through the rounding are undefined.

Example
-------
>>> import jax, jax.numpy as jnp
>>> from svt_speechbrain_tpu.ops.quant import quantize_weight, int8_matmul
>>> w = jax.random.normal(jax.random.PRNGKey(0), (64, 32))
>>> x = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
>>> w8, scale = quantize_weight(w)
>>> w8.dtype, scale.shape
(dtype('int8'), (32,))
>>> err = jnp.abs(int8_matmul(x, w8, scale) - x @ w).max()
>>> float(err / jnp.abs(x @ w).std()) < 0.1   # ~4% of output scale
True
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def quantize_weight(w, eps=1e-8):
    """Symmetric per-output-channel int8 quantization of a (in, out) matrix.

    Returns ``(w8, scale)`` with ``w ≈ w8 * scale`` and ``scale`` shaped
    ``(out,)``. Works for any ndim; the scale is over the LAST axis
    (output channels), reducing all leading axes.
    """
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)))
    scale = jnp.maximum(amax, eps) / 127.0
    w8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w8, scale


def quantize_activation(x, eps=1e-8):
    """Dynamic symmetric per-token int8: scales over the last axis.

    Returns ``(x8, scale)`` with ``x ≈ x8 * scale``; ``scale`` has shape
    ``x.shape[:-1] + (1,)`` so it broadcasts back over output channels.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, eps) / 127.0
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return x8.astype(jnp.int8), scale


def int8_matmul(x, w8, w_scale, out_dtype=None):
    """``x @ dequant(w8)`` computed on the int8 MXU path.

    ``x`` is float (any leading axes, contraction over the last axis);
    activations are quantized on the fly per token. Accumulation is
    int32; the two scales are folded back in one fused multiply.
    """
    out_dtype = out_dtype or x.dtype
    x8, x_scale = quantize_activation(x)
    y = lax.dot_general(x8, w8, (((x.ndim - 1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * x_scale * w_scale
    return y.astype(out_dtype)
