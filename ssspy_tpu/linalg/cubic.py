"""Complex-safe cube root (parity: ssspy/linalg/cubic.py:4-22)."""

import jax.numpy as jnp


def cbrt(x):
    """Cube root; for complex inputs the principal branch (phase / 3)."""
    if jnp.iscomplexobj(x):
        amplitude = jnp.abs(x)
        phase = jnp.angle(x)
        return jnp.cbrt(amplitude) * jnp.exp(1j * phase / 3).astype(x.dtype)
    return jnp.cbrt(x)
