"""svt_speechbrain_tpu — a TPU-native (JAX/XLA/Pallas/pjit) singing-voice-transcription framework.

A from-scratch rebuild of the capabilities of guxm2021/SVT_SpeechBrain (a
SpeechBrain-v0.5.11 fork shipping audio/video/audio-visual automatic music
transcription recipes) as an idiomatic JAX framework:

- ``nnet``      — functional neural-net op library (params as pytrees).
- ``ops``       — Pallas TPU kernels for the hot ops.
- ``models``    — model zoo: wav2vec2-style SSL encoder, AV-HuBERT-style visual
                  encoder, residual cross-attention (RCA) fusion, transformers.
- ``dataio``    — dynamic-item datasets, fixed-shape padded batching, loaders.
- ``parallel``  — device-mesh data/model parallelism over ICI/DCN.
- ``utils``     — AMT label/decode library, checkpointing, logging, metrics.
- ``processing``— DSP features, signal processing, augmentation.
- ``core``      — the training engine (``Brain``) and experiment/CLI contract.

Reference layer map: /root/reference — see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"

from svt_speechbrain_tpu.core import Stage, Brain, parse_arguments, create_experiment_directory  # noqa: F401
