"""Utilities: AMT label/decode library, transcription scoring, checkpointing,
logging, metrics, data helpers."""
