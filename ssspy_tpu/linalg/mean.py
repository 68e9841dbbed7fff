"""Geometric mean of PSD matrices (parity: ssspy/linalg/mean.py:6-83).

``A # B`` is computed as ``B (B^{-1} A)^{1/2}`` where the matrix square root
comes from the generalized eigendecomposition ``A z = lamb B z`` — all
batched over (sources, bins) leading axes.
"""

import jax.numpy as jnp

from .eigh import eigh


def gmeanmh(A, B, type: int = 1):
    """Geometric mean of Hermitian PSD matrices, batched.

    - ``type=1``: ``A # B``
    - ``type=2``: ``A^{-1} # B``
    - ``type=3``: ``A # B^{-1}``
    """
    lamb, Z = eigh(A, B, type=type)
    lamb = jnp.sqrt(lamb.astype(Z.dtype))
    ZLZ = (Z * lamb[..., None, :]) @ jnp.linalg.inv(Z)

    if type == 1:
        return B @ ZLZ
    elif type == 2:
        return jnp.linalg.inv(A) @ ZLZ
    elif type == 3:
        return jnp.linalg.inv(B) @ ZLZ
    raise ValueError(f"Invalid type={type} is given.")
