"""Principal component analysis rotation (parity: ssspy/transform/pca.py:4-96).

The reference hand-writes a transpose chain per (ndim, dtype) case; here a
single batched core handles every case: move the channel axis last, form
per-slice covariances over the trailing sample/frame axis with one einsum,
eigendecompose, rotate.
"""

import jax.numpy as jnp


def _channel_axis(input):
    """Reference layout rules: which axis holds channels (ssspy/transform/pca.py docstring)."""
    if input.ndim == 2:
        if jnp.iscomplexobj(input):
            raise ValueError("expected a real-valued array, got a complex one.")
        return 0
    if input.ndim == 3:
        return 0 if jnp.iscomplexobj(input) else 1
    if input.ndim == 4:
        if not jnp.iscomplexobj(input):
            raise ValueError("expected a complex-valued array, got a real one.")
        return 1
    raise ValueError(f"The dimension of input is expected 2, 3, or 4, but given {input.ndim}.")


def _covariance_eigh(X):
    """Eigh of the sample covariance of ``(*, n_samples, M)`` data."""
    n_samples = X.shape[-2]
    cov = jnp.einsum("...tm,...tn->...mn", X, X.conj()) / n_samples
    return jnp.linalg.eigh(cov)


def pca(input, ascend: bool = True):
    """Rotate channels onto principal components.

    Layouts (same as the reference): 2D real ``(M, T)``, 3D complex
    ``(M, I, T)``, 3D real ``(B, M, T)``, 4D complex ``(B, M, I, T)``.
    ``ascend=True`` puts the dominant component in the first channel.
    """
    ch_axis = _channel_axis(input)
    X = jnp.moveaxis(input, ch_axis, -1)  # (*, n_samples/frames, M)
    _, V = _covariance_eigh(X)
    if ascend:
        V = V[..., ::-1]
    Y = X @ V.conj()
    return jnp.moveaxis(Y, -1, ch_axis)
