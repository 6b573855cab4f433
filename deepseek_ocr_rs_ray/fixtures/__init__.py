"""Deterministic synthetic fixtures (seeded, no wall-clock, no external data)."""
