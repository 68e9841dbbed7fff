"""Proximal operators used by the PDS/ADMM solvers (parity: ssspy/linalg/prox.py:6-91)."""

import jax.numpy as jnp

__all__ = ["l1", "l21", "neg_log", "neg_logdet"]


def l1(x, step_size: float = 1):
    """Soft-thresholding (prox of the L1 norm)."""
    norm = jnp.abs(x)
    norm = jnp.where(norm < step_size, step_size, norm)
    return jnp.maximum(1 - step_size / norm, 0) * x


def l21(x, step_size: float = 1, axis1: int = -2, axis2: int = -1):
    """Group soft-thresholding (prox of the L21 norm) over ``axis2``."""
    norm = jnp.linalg.norm(x, axis=axis2, keepdims=True)
    norm = jnp.where(norm < step_size, step_size, norm)
    return jnp.maximum(1 - step_size / norm, 0) * x


def neg_log(x, step_size: float = 1):
    """Prox of ``-mu log(x)``: ``(x + sqrt(x^2 + 4 mu)) / 2`` for ``x >= 0``."""
    return (x + jnp.sqrt(x**2 + 4 * step_size)) / 2


def neg_logdet(X, step_size: float = 1):
    """Prox of the negative log-determinant via SVD singular-value shrinkage."""
    U, sigma, V = jnp.linalg.svd(X)
    sigma = neg_log(sigma, step_size=step_size)
    return (U * sigma[..., None, :].astype(U.dtype)) @ V
