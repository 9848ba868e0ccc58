"""Tokenization (SentencePiece wrapper + char/word fallbacks)."""
