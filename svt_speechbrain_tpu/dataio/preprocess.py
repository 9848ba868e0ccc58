"""Audio preprocessing for dynamic pipelines (analogue of reference
``speechbrain/dataio/preprocess.py``)."""
from __future__ import annotations

import numpy as np


class AudioNormalizer:
    """Resample to a target rate and mix channels (reference
    ``preprocess.py:8``): the loader-side normalization every pretrained
    interface applies to arbitrary input audio.

    Example
    -------
    >>> import numpy as np
    >>> norm = AudioNormalizer(sample_rate=16000)
    >>> stereo = np.stack([np.ones(80), np.zeros(80)], axis=1)  # 8 kHz stereo
    >>> out = norm(stereo, 8000)
    >>> out.shape, round(float(out.mean()), 2)    # upsampled 2x, mono-mixed
    ((160,), 0.5)
    """

    def __init__(self, sample_rate=16000, mix="avg-to-mono"):
        self.sample_rate = sample_rate
        if mix not in ("avg-to-mono", "keep"):
            raise ValueError(f"Unexpected mixing configuration {mix}")
        self.mix = mix

    def __call__(self, audio, sample_rate):
        """audio: (T,) or (T, C) numpy → normalized (T',) / (T', C)."""
        audio = np.asarray(audio, dtype=np.float32)
        if sample_rate != self.sample_rate:
            from math import gcd

            from scipy.signal import resample_poly

            g = gcd(int(self.sample_rate), int(sample_rate))
            audio = resample_poly(audio, int(self.sample_rate) // g,
                                  int(sample_rate) // g, axis=0).astype(np.float32)
        return self._mix(audio)

    def _mix(self, audio):
        if self.mix == "avg-to-mono":
            if audio.ndim == 1:
                return audio
            return audio.mean(axis=1)
        return audio
