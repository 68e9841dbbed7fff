"""Shared test utilities."""

import importlib.util

import numpy as np
import pytest


def reference_available() -> bool:
    return importlib.util.find_spec("ssspy") is not None


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="NumPy reference (ssspy) not importable"
)


def random_hermitian(rng, shape, psd: bool = False, complex: bool = True):
    """Random (optionally PSD) Hermitian matrices of shape (*, M, M)."""
    if complex:
        A = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    else:
        A = rng.standard_normal(shape)
    AH = np.swapaxes(A, -2, -1).conj()
    if psd:
        return A @ AH + shape[-1] * np.eye(shape[-1])
    return (A + AH) / 2


def assert_allclose_up_to_phase(a, b, atol=1e-8):
    """Assert complex arrays match up to one phase per trailing row.

    Rows are the last axis; the relative phase is estimated from the inner
    product and divided out before comparison.
    """
    a = np.asarray(a)
    b = np.asarray(b)
    inner = np.sum(a * b.conj(), axis=-1, keepdims=True)
    mag = np.abs(inner)
    phase = np.where(mag > 0, inner / np.where(mag > 0, mag, 1), 1)
    np.testing.assert_allclose(a, phase * b, atol=atol, rtol=0)


def si_sdr(estimate: np.ndarray, target: np.ndarray) -> float:
    """Scale-invariant SDR in dB between 1-D signals."""
    alpha = np.sum(estimate * target) / np.sum(target**2)
    target = alpha * target
    return 10 * np.log10(np.sum(target**2) / np.sum((estimate - target) ** 2))
