"""Pallas TPU kernels for small-matrix hot paths (populated after parity)."""
