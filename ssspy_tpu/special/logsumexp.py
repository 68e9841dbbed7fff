"""Numerically-stable log-sum-exp (parity: ssspy/special/logsumexp.py:4-40)."""

import jax.numpy as jnp


def logsumexp(X, axis=None, keepdims: bool = False):
    """Stable ``log(sum(exp(X)))`` over ``axis``."""
    vmax = jnp.max(X, axis=axis, keepdims=True)
    sum_exp = jnp.sum(jnp.exp(X - vmax), axis=axis, keepdims=True)
    v = jnp.log(sum_exp) + vmax
    if not keepdims:
        v = jnp.squeeze(v, axis=axis)
    return v
