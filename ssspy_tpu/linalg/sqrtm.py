"""Matrix square roots of PSD Hermitian matrices (parity: ssspy/linalg/sqrtm.py:8-64)."""

from typing import Callable, Optional

import jax.numpy as jnp

from .eigh import eigh


def _rebuild(P, lamb):
    PH = jnp.swapaxes(P, -2, -1)
    if jnp.iscomplexobj(P):
        PH = PH.conj()
    return (P * lamb[..., None, :]) @ PH


def sqrtmh(X):
    """Principal square root of PSD Hermitian/symmetric matrices ``(*, M, M)``."""
    lamb, P = eigh(X)
    return _rebuild(P, jnp.sqrt(lamb))


def invsqrtmh(X, flooring_fn: Optional[Callable] = None):
    """Inverse principal square root of PD Hermitian/symmetric matrices."""
    if flooring_fn is None:
        def flooring_fn(x):
            return x

    lamb, P = eigh(X)
    return _rebuild(P, 1 / flooring_fn(jnp.sqrt(lamb)))
