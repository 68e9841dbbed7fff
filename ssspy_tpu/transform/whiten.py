"""Whitening / sphering transform (parity: ssspy/transform/whiten.py:4-94).

Single batched core replacing the reference's per-(ndim, dtype) transpose
chains: ``y = Lambda^{-1/2} V^H x`` per covariance slice.
"""

import jax.numpy as jnp

from .pca import _channel_axis, _covariance_eigh


def whiten(input):
    """Sphere the channel dimension so the sample covariance is identity.

    Layouts (same as the reference): 2D real ``(M, T)``, 3D complex
    ``(M, I, T)``, 3D real ``(B, M, T)``, 4D complex ``(B, M, I, T)``.
    """
    ch_axis = _channel_axis(input)
    X = jnp.moveaxis(input, ch_axis, -1)  # (*, n_samples/frames, M)
    W, V = _covariance_eigh(X)
    Y = (X @ V.conj()) / jnp.sqrt(W[..., None, :]).astype(X.dtype)
    return jnp.moveaxis(Y, -1, ch_axis)
