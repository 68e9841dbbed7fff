"""Base class of proximal-splitting BSS (PDS/ADMM).

Parity target: ssspy/bss/proxbss.py (ProxBSSBase: penalty/prox lists,
spectral-norm input normalization, scale restoration).
"""

from typing import Callable, List, Optional, Union

import jax.numpy as jnp

from ..algorithm import (
    MINIMAL_DISTORTION_PRINCIPLE_KEYWORDS,
    PROJECTION_BACK_KEYWORDS,
    minimal_distortion_principle,
    projection_back,
)
from .base import IterativeMethodBase, config_repr
from .iva import _ls_demix, _separate

EPS = 1e-10

__all__ = ["ProxBSSBase"]


class ProxBSSBase(IterativeMethodBase):
    """Base class of BSS via proximal splitting (parity: ssspy/bss/proxbss.py:16-266)."""

    def __init__(
        self,
        penalty_fn: Optional[Callable] = None,
        prox_penalty: Callable = None,
        callbacks: Optional[Union[Callable, List[Callable]]] = None,
        scale_restoration: bool = True,
        record_loss: Optional[bool] = None,
        reference_id: int = 0,
    ) -> None:
        if penalty_fn is None:
            # penalty_fn is not necessarily available in closed form
            if record_loss is None:
                record_loss = False
            assert not record_loss, "record_loss=True needs a penalty_fn to evaluate."
        else:
            if callable(penalty_fn):
                penalty_fn = [penalty_fn]
            if record_loss is None:
                record_loss = True

        super().__init__(callbacks=callbacks, record_loss=record_loss)

        if prox_penalty is None:
            raise ValueError("a prox_penalty must be provided.")
        if callable(prox_penalty):
            prox_penalty = [prox_penalty]

        self.penalty_fn = penalty_fn
        self.prox_penalty = prox_penalty

        if self.penalty_fn is not None:
            assert len(self.penalty_fn) == len(
                self.prox_penalty
            ), "penalty_fn and prox_penalty lists must have equal length."

        self.input = None
        self.scale_restoration = scale_restoration

        if reference_id is None and scale_restoration:
            raise ValueError("scale_restoration=True needs a reference_id channel.")
        self.reference_id = reference_id

    def __repr__(self) -> str:
        keys = ["n_penalties", "scale_restoration", "record_loss"]
        if self.scale_restoration:
            keys += ["reference_id"]
        return config_repr(self, "ProxBSSBase", keys)

    def _reset(self, **kwargs) -> None:
        assert self.input is not None, "no input bound; call the separator with a spectrogram first."

        for key in kwargs.keys():
            setattr(self, key, kwargs[key])

        X = self.input
        n_channels, n_bins, n_frames = X.shape
        n_sources = n_channels

        self.n_sources, self.n_channels = n_sources, n_channels
        self.n_bins, self.n_frames = n_bins, n_frames

        if not hasattr(self, "demix_filter"):
            W = jnp.tile(jnp.eye(n_sources, n_channels, dtype=X.dtype), (n_bins, 1, 1))
        else:
            W = None if self.demix_filter is None else jnp.asarray(self.demix_filter).copy()

        self.demix_filter = W
        self.output = self.separate(X, demix_filter=W)

    @property
    def n_penalties(self):
        return len(self.prox_penalty)

    def separate(self, input, demix_filter):
        if demix_filter is None:
            return None
        return _separate(jnp.asarray(input), jnp.asarray(demix_filter))

    def compute_logdet(self, demix_filter):
        _, logdet = jnp.linalg.slogdet(demix_filter)
        return logdet

    def make_loss(self):
        penalty_fns = self.penalty_fn

        def loss(state):
            X, W = state["X"], state["W"]
            Y = _separate(X, W)
            _, logdet = jnp.linalg.slogdet(W)
            penalty = 0
            for penalty_fn in penalty_fns:
                penalty = penalty + penalty_fn(Y)
            return penalty - jnp.sum(logdet)

        return loss

    def normalize_by_spectral_norm(self, input, n_penalties: int = None):
        """Scale the mixture so the PDS/ADMM operator norm is bounded
        (parity: ssspy/bss/proxbss.py:205-223)."""
        if n_penalties is None:
            n_penalties = self.n_penalties

        X = jnp.asarray(input)
        norm = jnp.linalg.norm(jnp.swapaxes(X, 0, 1), ord=2, axis=(-2, -1))
        norm = jnp.max(norm)
        return X / (jnp.sqrt(jnp.asarray(float(n_penalties))) * norm).astype(X.dtype)

    def restore_scale(self) -> None:
        scale_restoration = self.scale_restoration
        assert scale_restoration, "scale restoration is disabled on this instance."

        if type(scale_restoration) is bool:
            scale_restoration = "projection_back"

        if scale_restoration in PROJECTION_BACK_KEYWORDS:
            self.apply_projection_back()
        elif scale_restoration in MINIMAL_DISTORTION_PRINCIPLE_KEYWORDS:
            self.apply_minimal_distortion_principle()
        else:
            raise ValueError(f"{scale_restoration} is not supported for scale restoration.")

    def apply_projection_back(self) -> None:
        assert self.scale_restoration, "scale restoration is disabled on this instance."
        X, W = self.input, self.demix_filter
        W_scaled = projection_back(W, reference_id=self.reference_id)
        self.output, self.demix_filter = _separate(X, W_scaled), W_scaled

    def apply_minimal_distortion_principle(self) -> None:
        assert self.scale_restoration, "scale restoration is disabled on this instance."
        X, W = self.input, self.demix_filter
        Y = _separate(X, W)
        Y_scaled = minimal_distortion_principle(Y, reference=X, reference_id=self.reference_id)
        self.output = Y_scaled
        self.demix_filter = _ls_demix(Y_scaled, X)
