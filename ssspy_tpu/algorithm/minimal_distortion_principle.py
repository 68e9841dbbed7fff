"""Minimal-distortion-principle rescaling (parity: ssspy/algorithm/minimal_distortion_principle.py:6-43)."""

from typing import Optional

import jax.numpy as jnp


def minimal_distortion_principle(
    estimated,
    reference: Optional[jnp.ndarray] = None,
    reference_id: Optional[int] = 0,
):
    """MDP rescaling ``z = <Y, X_ref> / |Y|^2`` applied per (source, bin).

    ``estimated``: separated spectrograms ``(n_sources, n_bins, n_frames)``;
    ``reference``: mixture ``(n_channels, n_bins, n_frames)``.
    """
    Y = estimated
    X_conj = reference.conj()

    if reference_id is None:
        num = jnp.sum(Y * X_conj[:, None, :, :], axis=-1, keepdims=True)
    else:
        num = jnp.sum(Y * X_conj[reference_id], axis=-1, keepdims=True)

    denom = jnp.sum(jnp.abs(Y) ** 2, axis=-1, keepdims=True)
    Z = num / denom
    return Z.conj() * Y
