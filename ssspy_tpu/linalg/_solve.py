"""Batched linear solve with matrix/vector RHS broadcasting.

Same role as the reference's numpy>=2 shim (ssspy/linalg/_solve.py:9-21):
``jax.numpy.linalg.solve`` (like numpy>=2) treats an RHS with
``a.ndim == b.ndim + 1`` as ambiguous, so stacks of vectors are promoted to
column matrices explicitly.
"""

import jax.numpy as jnp


def solve(a, b):
    """Solve ``a x = b`` batched; ``b`` may be a stack of vectors or matrices."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if a.ndim == b.ndim + 1:
        return jnp.linalg.solve(a, b[..., None])[..., 0]
    return jnp.linalg.solve(a, b)
