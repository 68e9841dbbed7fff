"""Harmonic vector analysis (HVA).

Parity target: ssspy/bss/hva.py (MaskingPDSHVA, MaskingADMMHVA, HVA).
The harmonic cepstral mask (ssspy/bss/hva.py:81-115): log-magnitude ->
irfft over the bin axis (cepstrum) -> cosine shrinkage applied
``mask_iter`` times -> irfft back -> softmax-power mask. All FFTs are
``jnp.fft.irfft`` batched over (sources, frames).
"""

import functools
import math
from typing import Callable, List, Optional, Union

import jax.numpy as jnp

from ..special.flooring import identity, max_flooring, resolve_flooring_spec
from .admmbss import MaskingADMMBSS
from .pdsbss import MaskingPDSBSS

from .base import config_repr

__all__ = ["MaskingPDSHVA", "MaskingADMMHVA", "HVA"]

EPS = 1e-10


def _make_harmonic_mask_fn(method):
    """Cepstral-shrinkage mask closure over the method instance."""

    def mask_fn(y):
        n_sources, n_bins, _ = y.shape

        if method.attenuation is None:
            method.attenuation = 1 / n_sources
        gamma = method.attenuation

        y = method.flooring_fn(jnp.abs(y))
        zeta = jnp.log(y)
        zeta_mean = zeta.mean(axis=1, keepdims=True)
        rho = zeta - zeta_mean
        nu = jnp.fft.irfft(rho, axis=1, norm="backward")[:, :n_bins]
        varsigma = jnp.minimum(1, nu)

        for _ in range(method.mask_iter):
            varsigma = (1 - jnp.cos(math.pi * varsigma)) / 2

        xi = jnp.fft.irfft(varsigma * nu, axis=1, norm="forward")[:, :n_bins]
        varrho = xi + zeta_mean
        v = jnp.exp(2 * varrho)
        return (v / v.sum(axis=0)) ** gamma

    return mask_fn


class MaskingPDSHVA(MaskingPDSBSS):
    """HVA via masking PDS (parity: ssspy/bss/hva.py:20-155)."""

    _sc_mask = "harmonic"

    def __init__(
        self,
        mu1: float = 1,
        mu2: float = 1,
        alpha: float = None,
        relaxation: float = 1,
        attenuation: Optional[float] = None,
        mask_iter: int = 1,
        flooring_fn: Union[str, Callable, None] = "dtype",
        callbacks: Optional[Union[Callable, List[Callable]]] = None,
        scale_restoration: bool = True,
        record_loss: Optional[bool] = None,
        reference_id: int = 0,
        impl: str = "auto",
    ) -> None:
        super().__init__(
            mu1=mu1,
            mu2=mu2,
            alpha=alpha,
            relaxation=relaxation,
            penalty_fn=None,
            mask_fn=_make_harmonic_mask_fn(self),
            callbacks=callbacks,
            scale_restoration=scale_restoration,
            record_loss=record_loss,
            reference_id=reference_id,
            impl=impl,
        )

        self.attenuation = attenuation
        self.mask_iter = mask_iter
        self.flooring_fn = resolve_flooring_spec(flooring_fn)

    def __repr__(self) -> str:
        keys = ["mu1", "mu2", "relaxation"]
        if self.attenuation is not None:
            keys += ["attenuation"]
        keys += ["mask_iter", "scale_restoration", "record_loss"]
        if self.scale_restoration:
            keys += ["reference_id"]
        return config_repr(self, "MaskingPDSHVA", keys)


class MaskingADMMHVA(MaskingADMMBSS):
    """HVA via masking ADMM (parity: ssspy/bss/hva.py:158-275)."""

    _sc_mask = "harmonic"

    def __init__(
        self,
        rho: float = 1,
        alpha: float = None,
        relaxation: float = 1,
        attenuation: Optional[float] = None,
        mask_iter: int = 1,
        flooring_fn: Union[str, Callable, None] = "dtype",
        callbacks: Optional[Union[Callable, List[Callable]]] = None,
        scale_restoration: bool = True,
        record_loss: Optional[bool] = None,
        reference_id: int = 0,
        impl: str = "auto",
    ) -> None:
        super().__init__(
            rho=rho,
            alpha=alpha,
            relaxation=relaxation,
            penalty_fn=None,
            mask_fn=_make_harmonic_mask_fn(self),
            callbacks=callbacks,
            scale_restoration=scale_restoration,
            record_loss=record_loss,
            reference_id=reference_id,
            impl=impl,
        )

        self.attenuation = attenuation
        self.mask_iter = mask_iter
        self.flooring_fn = resolve_flooring_spec(flooring_fn)

    def __repr__(self) -> str:
        keys = ["rho", "relaxation"]
        if self.attenuation is not None:
            keys += ["attenuation"]
        keys += ["mask_iter", "scale_restoration", "record_loss"]
        if self.scale_restoration:
            keys += ["reference_id"]
        return config_repr(self, "MaskingADMMHVA", keys)


class HVA(MaskingPDSHVA):
    """Alias of :class:`MaskingPDSHVA` (parity: ssspy/bss/hva.py:278-298)."""

    def __repr__(self) -> str:
        keys = ["mu1", "mu2", "relaxation"]
        if self.attenuation is not None:
            keys += ["attenuation"]
        keys += ["mask_iter", "scale_restoration", "record_loss"]
        if self.scale_restoration:
            keys += ["reference_id"]
        return config_repr(self, "HVA", keys)
