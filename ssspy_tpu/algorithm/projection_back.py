"""Projection-back scale restoration (parity: ssspy/algorithm/projection_back.py:6-121).

Two modes, both batched over bins in one XLA program:

- filter mode (``reference=None``): rescale each demixing-filter row by the
  corresponding column of ``W^{-1}`` at the reference channel;
- data mode: least-squares rescale of separated spectrograms against the
  reference-channel mixture.
"""

from typing import Optional

import jax.numpy as jnp


def projection_back(
    data_or_filter,
    reference: Optional[jnp.ndarray] = None,
    reference_id: Optional[int] = 0,
):
    """Restore the scale ambiguity of separated signals.

    Args:
        data_or_filter: demixing filters ``(*, N, M)`` when ``reference`` is
            ``None``, otherwise separated spectrograms ``(N, I, T)``.
        reference: mixture spectrogram ``(M, I, T)`` (data mode only).
        reference_id: reference channel; ``None`` returns per-channel scalings.

    Returns:
        Rescaled filters or spectrograms.
    """
    if reference is None:
        W = data_or_filter  # (*, n_sources, n_channels)
        scale = jnp.linalg.inv(W)  # (*, n_channels, n_sources)

        if reference_id is None:
            scale = scale[..., None]  # (*, n_channels, n_sources, 1)
            scale = jnp.moveaxis(scale, -3, 0)  # (n_channels, *, n_sources, 1)
            return W * scale
        scale = scale[..., reference_id, :]  # (*, n_sources)
        return W * scale[..., None]

    Y = jnp.swapaxes(data_or_filter, -3, -2)  # (*, n_bins, n_sources, n_frames)
    X = jnp.swapaxes(reference, -3, -2)  # (*, n_bins, n_channels, n_frames)
    YH = jnp.swapaxes(Y, -2, -1).conj()
    XYH = X @ YH  # (*, n_bins, n_channels, n_sources)
    YYH = Y @ YH  # (*, n_bins, n_sources, n_sources)
    scale = XYH @ jnp.linalg.inv(YYH)  # (*, n_bins, n_channels, n_sources)

    if reference_id is None:
        scale = jnp.moveaxis(scale, -2, 0)  # (n_channels, *, n_bins, n_sources)
        Y_scaled = Y * scale[..., None]
        return jnp.swapaxes(Y_scaled, -3, -2)
    scale = scale[..., reference_id, :]  # (*, n_bins, n_sources)
    Y_scaled = Y * scale[..., None]
    return jnp.swapaxes(Y_scaled, -3, -2)
