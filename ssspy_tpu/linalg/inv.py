"""Closed-form 2x2 inverse (parity: ssspy/linalg/inv.py:4-54).

The 2x2 adjugate formula is fully elementwise, so it vectorizes over any
batch of (bins, pairs) on the VPU with no LAPACK-style factorization.
"""

import jax.numpy as jnp


def inv2(X):
    """Invert a batch of 2x2 matrices of shape ``(*, 2, 2)`` in closed form."""
    assert X.shape[-2:] == (2, 2), f"2x2 matrix is expected, but given shape of {X.shape}."

    a = X[..., 0, 0]
    b = X[..., 0, 1]
    c = X[..., 1, 0]
    d = X[..., 1, 1]
    det = a * d - b * c

    adj = jnp.stack(
        [jnp.stack([d, -b], axis=-1), jnp.stack([-c, a], axis=-1)],
        axis=-2,
    )
    return adj / det[..., None, None]
