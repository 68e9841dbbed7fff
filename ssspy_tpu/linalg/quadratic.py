"""Batched quadratic forms ``x^H A x`` (parity: ssspy/linalg/quadratic.py:4-25)."""

import jax.numpy as jnp


def quadratic(X, A):
    """Compute ``x^H A x`` for vectors ``(*, M)`` against matrices ``(*, M, M)``."""
    XH = X.conj() if jnp.iscomplexobj(X) else X
    return jnp.einsum("...m,...mn,...n->...", XH, A, X)
