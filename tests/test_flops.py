"""Analytic FLOPs accounting (utils/flops.py) sanity checks."""
import numpy as np

from svt_speechbrain_tpu.models.wav2vec2 import Wav2Vec2Config
from svt_speechbrain_tpu.utils import flops


def test_large_model_flops_per_audio_second_in_expected_band():
    """wav2vec2-large on 16 kHz audio costs ~35-40 GFLOP per audio-second
    (24 layers × (8Td² + 4T²d + 4Tdf) dominates; conv frontend ~25 G per
    5 s chunk). Guards against unit slips (MACs vs FLOPs, per-chunk vs
    per-second)."""
    cfg = Wav2Vec2Config()  # large defaults
    samples = 5 * 16000
    per_audio_sec = flops.amt_forward_flops(cfg, samples) / 5.0
    assert 30e9 < per_audio_sec < 45e9, per_audio_sec


def test_train_flops_multipliers():
    cfg = Wav2Vec2Config(hidden_size=64, num_layers=2, num_heads=4,
                         ffn_size=128, conv_dim=(32,) * 7)
    fwd = flops.amt_forward_flops(cfg, 16000)
    assert flops.amt_train_flops(cfg, 16000) == 3 * fwd
    assert flops.amt_train_flops(cfg, 16000, remat=True) == 4 * fwd


def test_encoder_flops_scale_quadratically_in_t():
    """The attention term makes cost superlinear in T; the rest is linear."""
    cfg = Wav2Vec2Config()
    f1 = flops.encoder_flops(cfg, 1000)
    f2 = flops.encoder_flops(cfg, 2000)
    assert f2 > 2 * f1
    attn_only = cfg.num_layers * 4.0 * 2000 * 2000 * cfg.hidden_size
    assert f2 - 2 * f1 < attn_only  # the superlinear excess is the T² term


def test_mfu_is_achieved_over_peak():
    got = flops.mfu(1e12, 50.0)  # 50 TFLOP/s achieved
    assert np.isclose(got, 50e12 / flops.peak_flops_per_sec())
