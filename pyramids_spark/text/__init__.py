"""Training-data text pipeline: dedup, quality, language-ID, fingerprints."""
