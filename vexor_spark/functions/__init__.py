"""Scalar/column-level functions: tokenization, extraction, codecs."""
