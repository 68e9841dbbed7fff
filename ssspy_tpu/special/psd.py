"""Projection onto the positive-semidefinite cone.

Parity target: ssspy/special/psd.py:11-71 (symmetrize -> eigh -> floor
eigenvalues -> reassemble -> symmetrize). Batched over all leading axes via
``jnp.linalg.eigh``; a Pallas small-matrix path can replace the eigh for
M <= 8 once profiled.
"""

import functools
from typing import Callable, Optional

import jax.numpy as jnp

from .flooring import EPS, identity, max_flooring


def _hermitize(X):
    XH = jnp.swapaxes(X, -2, -1)
    if jnp.iscomplexobj(X):
        XH = XH.conj()
    return (X + XH) / 2


def to_psd(
    X,
    axis1: int = -2,
    axis2: int = -1,
    flooring_fn: Optional[Callable] = functools.partial(max_flooring, eps=EPS),
):
    """Project Hermitian (or symmetric) matrices onto the PSD cone.

    Args:
        X: matrices of shape ``(*, M, M)``.
        axis1, axis2: must address the trailing two axes (kept for API parity).
        flooring_fn: eigenvalue flooring; ``None`` selects identity.

    Returns:
        PSD-projected matrices, same shape as ``X``.
    """
    if flooring_fn is None:
        flooring_fn = identity

    n_dims = X.ndim
    axis1 = n_dims + axis1 if axis1 < 0 else axis1
    axis2 = n_dims + axis2 if axis2 < 0 else axis2
    assert axis1 == n_dims - 2 and axis2 == n_dims - 1, "axis1 == -2 and axis2 == -1"

    X = _hermitize(X)
    lamb, P = jnp.linalg.eigh(X)
    PH = jnp.swapaxes(P, -2, -1)
    if jnp.iscomplexobj(X):
        PH = PH.conj()
    lamb = flooring_fn(lamb)
    X = (P * lamb[..., None, :]) @ PH
    return _hermitize(X)
