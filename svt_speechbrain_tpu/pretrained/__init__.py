"""Pretrained-model inference interfaces and artifact fetching."""

from svt_speechbrain_tpu.pretrained.fetching import fetch  # noqa: F401
from svt_speechbrain_tpu.pretrained.interfaces import (  # noqa: F401
    EncoderASR,
    EncoderClassifier,
    EncoderDecoderASR,
    Pretrained,
    SepformerSeparation,
    SingingTranscriber,
    SpeakerRecognition,
    SpectralMaskEnhancement,
    VAD,
)
