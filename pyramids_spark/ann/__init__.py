"""Approximate/exact nearest-neighbor search over embedding columns."""
