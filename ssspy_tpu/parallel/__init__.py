"""Device-mesh sharding helpers (frequency-bin / batch axes over ICI)."""
