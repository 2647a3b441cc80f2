"""Deterministic seed-pinned spatial fixtures (FIXTURES.md schemas)."""
