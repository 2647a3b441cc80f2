"""Scalar kernels: text extraction, coordinate parsing, token labeling,
projection — all Arrow-vectorized pandas UDFs (no per-row Python)."""
