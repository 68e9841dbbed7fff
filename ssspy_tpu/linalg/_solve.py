"""Batched linear solve with matrix/vector RHS broadcasting.

The reference needs a numpy>=2 shim (ssspy/linalg/_solve.py:9-21);
``jnp.linalg.solve`` already treats ``b`` with ``a.ndim == b.ndim + 1`` as a
stack of vectors, so this is a direct alias kept for API parity.
"""

import jax.numpy as jnp


def solve(a, b):
    """Solve ``a x = b`` batched; ``b`` may be a stack of vectors or matrices."""
    return jnp.linalg.solve(a, b)
