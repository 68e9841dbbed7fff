"""Numerically-stable softmax (parity: ssspy/special/softmax.py:4-36)."""

import jax.numpy as jnp


def softmax(X, axis=None):
    """Stable softmax over ``axis`` (``None`` = all elements)."""
    vmax = jnp.max(X, axis=axis, keepdims=True)
    exp = jnp.exp(X - vmax)
    return exp / jnp.sum(exp, axis=axis, keepdims=True)
