"""Structured Streaming operators (incremental analogs of the
reference's restartable batch semantics)."""
