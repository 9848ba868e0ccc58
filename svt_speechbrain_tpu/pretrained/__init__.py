"""Pretrained-model inference interfaces and artifact fetching."""

from svt_speechbrain_tpu.pretrained.fetching import fetch  # noqa: F401
from svt_speechbrain_tpu.pretrained.interfaces import Pretrained, SingingTranscriber  # noqa: F401
