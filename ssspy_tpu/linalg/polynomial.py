"""Closed-form (Cardano) cubic root finder (parity: ssspy/linalg/polynomial.py:9-95).

All branching is expressed as ``jnp.where`` masks so the solver vectorizes
over arbitrary batches without data-dependent control flow.
"""

from typing import Optional

import jax.numpy as jnp

from .cubic import cbrt


def solve_cubic(A, B, C, D: Optional[jnp.ndarray] = None, all: bool = True):
    """Find roots of cubic equations.

    With ``D`` given solves ``A x^3 + B x^2 + C x + D = 0`` (requires all
    ``A != 0``); otherwise solves the monic ``x^3 + A x^2 + B x + C = 0``.

    Returns all three (complex) roots stacked on a new leading axis when
    ``all=True``, else the first root.
    """
    if D is not None:
        return solve_cubic(B / A, C / A, D / A, all=all)

    P = -(A**2) / 3 + B
    Q = (2 * A**3) / 27 - (A * B) / 3 + C

    X = _find_cubic_roots(P, Q)
    x = X - A / 3
    return x if all else x[0]


def _find_cubic_roots(P, Q):
    """Roots of the depressed cubic ``x^3 + P x + Q = 0`` (shape ``(3, *)``)."""
    cdtype = jnp.result_type(P, Q, jnp.complex64)
    P = P.astype(cdtype)
    Q = Q.astype(cdtype)
    omega = (-1 + 1j * jnp.sqrt(jnp.asarray(3.0))).astype(cdtype) / 2
    omega_conj = jnp.conj(omega)

    discriminant = (Q / 2) ** 2 + (P / 3) ** 3

    U = cbrt(-Q / 2 + jnp.sqrt(discriminant))
    # U = 0 exactly when P = 0; mask to avoid 0-division, fix roots below.
    is_singular = P == 0
    U = jnp.where(is_singular, jnp.ones_like(U), U)
    V = -P / (3 * U)

    X1 = jnp.where(is_singular, cbrt(-Q), U + V)
    X2 = jnp.where(is_singular, X1 * omega, U * omega + V * omega_conj)
    X3 = jnp.where(is_singular, X1 * omega_conj, U * omega_conj + V * omega)

    return jnp.stack([X1, X2, X3], axis=0)
