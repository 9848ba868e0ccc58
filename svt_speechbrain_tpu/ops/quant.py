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

import os

import numpy as np

import jax
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

    ``SVT_INT8_FUSED=1`` (read at trace time) routes TPU-backend calls with
    MXU-tileable dims through the fused Pallas kernel
    (``int8_matmul_fused``) instead of the separate-quant-pass XLA lowering.
    """
    out_dtype = out_dtype or x.dtype
    if (os.environ.get("SVT_INT8_FUSED", "0") == "1"
            and jax.default_backend() == "tpu"
            and x.shape[-1] % 128 == 0 and w8.shape[1] % 128 == 0):
        return int8_matmul_fused(x, w8, w_scale, out_dtype=out_dtype)
    x8, x_scale = quantize_activation(x)
    y = lax.dot_general(x8, w8, (((x.ndim - 1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * x_scale * w_scale
    return y.astype(out_dtype)


# ---------------------------------------------------------------------------
# Fused quantize+matmul Pallas kernel: the XLA path above quantizes x in a
# separate VPU pass (an extra HBM round-trip of the activations per matmul);
# this kernel folds the per-token amax/round into the operand load — x is
# read ONCE, quantized into a VMEM scratch on the first output-column block,
# and reused for every column block of that row block.
# ---------------------------------------------------------------------------

def _qmm_kernel(x_ref, w_ref, ws_ref, out_ref, x8_ref, xs_ref):
    from jax.experimental import pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _quantize_rows():
        xa = x_ref[...].astype(jnp.float32)
        amax = jnp.max(jnp.abs(xa), axis=1, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        x8_ref[...] = jnp.clip(jnp.round(xa / scale),
                               -127, 127).astype(jnp.int8)
        xs_ref[...] = scale

    acc = jnp.dot(x8_ref[...], w_ref[...],
                  preferred_element_type=jnp.int32)
    out_ref[...] = (acc.astype(jnp.float32) * xs_ref[...]
                    * ws_ref[...].astype(jnp.float32)).astype(out_ref.dtype)


def int8_matmul_fused(x, w8, w_scale, out_dtype=None, block_m=256,
                      block_n=512, interpret=False):
    """``int8_matmul`` with the activation quantization fused into the
    matmul's operand load (one Pallas program; x8 + per-token scales live
    in VMEM scratch across the output-column grid).

    Requirements: K and N multiples of 128 (model dims are); M is padded
    here. Inference-only, like the XLA path.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> from svt_speechbrain_tpu.ops.quant import (quantize_weight,
    ...     int8_matmul, int8_matmul_fused)
    >>> w8, ws = quantize_weight(
    ...     jax.random.normal(jax.random.PRNGKey(0), (256, 128)))
    >>> x = jax.random.normal(jax.random.PRNGKey(1), (4, 10, 256))
    >>> a = int8_matmul(x, w8, ws)
    >>> b = int8_matmul_fused(x, w8, ws, interpret=True)
    >>> bool(jnp.allclose(a, b, atol=1e-5))
    True
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = w8.shape[1]
    if k % 128 or n % 128:
        raise ValueError(f"K and N must be lane-aligned (multiples of "
                         f"128); got K={k}, N={n}")
    m = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(m, k)
    # prefer a sublane-aligned block that DIVIDES m: jnp.pad would copy
    # the whole activation tensor per matmul (measured model-level loss)
    top = min(block_m, m) // 8 * 8
    bm = next((b for b in range(top, 31, -8) if m % b == 0),
              min(block_m, max(32, -(-m // 8) * 8)))  # aligned fallback+pad
    # bn must tile n exactly — a floor-divided grid would silently leave
    # trailing output columns unwritten
    bn = next(b for b in range(min(block_n, n), 127, -128) if n % b == 0)
    pad_m = (-m) % bm
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
    mp = m + pad_m

    out = pl.pallas_call(
        _qmm_kernel,
        grid=(mp // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, k), jnp.int8),
                        pltpu.VMEM((bm, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(x2, w8, w_scale.reshape(1, n))
    return out[:m].reshape(*lead, n)
