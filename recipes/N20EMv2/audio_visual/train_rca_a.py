#!/usr/bin/env python3
"""Recipe: audio-only RCA control — identical to ``train_rca_av.py`` but the
video feature stream is zeroed (reference
``N20EMv2/audio_visual/train_rca_a.py:37``) for the noise-robustness
A-vs-AV comparison."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # sibling recipe imports

from svt_speechbrain_tpu.tasks.amt import FusionAMT  # noqa: E402
from train_rca_av import main  # noqa: E402


class AMT(FusionAMT):
    """Audio-only RCA control with zeroed video stream."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, zero_video=True, **kwargs)


if __name__ == "__main__":
    main(AMT)
