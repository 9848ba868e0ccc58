"""Analytic FLOPs accounting for the wav2vec2 pipeline.

The benches report RTFx (audio-seconds per wall-clock second), but the
host↔device link in this environment has ~3× run-to-run variance, so RTFx
alone is a noisy lower bound. MFU (model FLOPs utilization = achieved
FLOP/s over the chip's peak) derived from an *analytic* FLOP count is
link-variance-independent: the numerator counts only the model's useful
work, the denominator is a hardware constant.

Conventions: one multiply-accumulate = 2 FLOPs; only matmul/conv terms are
counted (norms, activations, softmax are bandwidth-bound noise on the MXU).
The reference framework has no FLOPs accounting at all (its profiler,
``speechbrain/utils/profiling.py``, wraps torch.profiler without analytic
counts); this is TPU-side bookkeeping we add on top.
"""
from __future__ import annotations

import os

# Peak dense bf16 matmul throughput per chip. Default is TPU v5e (197
# TFLOP/s bf16). Override with TPU_PEAK_TFLOPS for other generations
# (v4: 275, v5p: 459, v6e: 918).
DEFAULT_PEAK_TFLOPS = 197.0


def peak_flops_per_sec() -> float:
    return float(os.environ.get("TPU_PEAK_TFLOPS", DEFAULT_PEAK_TFLOPS)) * 1e12


def conv_frontend_flops(config, num_samples: int) -> float:
    """FLOPs of the strided conv feature extractor on one example."""
    from svt_speechbrain_tpu.nnet.cnn import conv_output_length

    t = num_samples
    in_ch = 1
    total = 0.0
    for out_ch, k, s in zip(config.conv_dim, config.conv_kernel,
                            config.conv_stride):
        t = conv_output_length(t, k, s, padding="valid")
        total += 2.0 * in_ch * k * out_ch * t
        in_ch = out_ch
    return total


def encoder_flops(config, t_frames: int) -> float:
    """FLOPs of the transformer encoder (pos-conv + all layers) on one
    example of ``t_frames`` frames."""
    d = config.hidden_size
    f = config.ffn_size
    t = t_frames
    # grouped positional conv ("same" padding → t outputs)
    k = config.num_conv_pos_embeddings
    groups = config.num_conv_pos_embedding_groups
    total = 2.0 * (d / groups) * k * d * t
    # feature projection conv_dim[-1] → d
    total += 2.0 * t * config.conv_dim[-1] * d
    per_layer = (
        8.0 * t * d * d       # q/k/v/out projections
        + 4.0 * t * t * d     # scores (QK^T) + context (AV)
        + 4.0 * t * d * f     # FFN in + out
    )
    return total + config.num_layers * per_layer


def amt_forward_flops(config, num_samples: int, head_out: int = 20) -> float:
    """Analytic forward FLOPs of the flagship AMT pipeline (conv frontend +
    encoder + linear frame head) on one example of ``num_samples`` samples."""
    t = config.output_length(num_samples)
    return (conv_frontend_flops(config, num_samples)
            + encoder_flops(config, t)
            + 2.0 * t * config.hidden_size * head_out)


def amt_train_flops(config, num_samples: int, head_out: int = 20,
                    remat: bool = False) -> float:
    """Analytic FLOPs of one training example: forward + backward (the
    backward of a matmul costs 2× its forward), plus one extra forward when
    per-layer rematerialization recomputes activations."""
    fwd = amt_forward_flops(config, num_samples, head_out)
    return fwd * (4.0 if remat else 3.0)


def mfu(flops_per_example: float, examples_per_sec: float) -> float:
    """Model FLOPs utilization in [0, 1].

    Example
    -------
    >>> import os
    >>> os.environ["TPU_PEAK_TFLOPS"] = "100"
    >>> mfu(1e12, 50.0)     # 50 TFLOP/s achieved on a 100 TFLOP/s chip
    0.5
    >>> del os.environ["TPU_PEAK_TFLOPS"]
    """
    return flops_per_example * examples_per_sec / peak_flops_per_sec()
