"""Flooring primitives for numerical stability.

Every division / sqrt in the framework is guarded by a user-swappable
flooring function, mirroring the reference's safety model
(ssspy/special/flooring.py:1-18). All functions are jittable jnp one-liners.
"""

import jax.numpy as jnp

EPS = 1e-10


def identity(input):
    """Return the input unchanged (disable flooring)."""
    return input


def max_flooring(input, eps: float = EPS):
    """Elementwise ``max(input, eps)``."""
    return jnp.maximum(input, eps)


def add_flooring(input, eps: float = EPS):
    """Elementwise ``input + eps``."""
    return input + eps
