"""Primal-dual splitting BSS.

Parity target: ssspy/bss/pdsbss.py (PDSBSS, MaskingPDSBSS). One
iteration: primal prox (SVD shrinkage of the demixing filter,
ssspy/bss/pdsbss.py:197-219), reflected separation, dual prox (or
masking), relaxation. The whole loop compiles to one ``lax.scan``; the
SVD batches over bins.
"""

import warnings
from typing import Callable, List, Optional, Union

import jax.numpy as jnp

from ..linalg import prox
from .base import IterativeMethodBase, config_repr
from .iva import _separate
from .proxbss import ProxBSSBase

EPS = 1e-10

__all__ = ["PDSBSS", "MaskingPDSBSS"]


def _pds_primal(X, W, Y_sum, mu1, mu2):
    """``W_tilde = prox_neglogdet(W - mu1 mu2 (sum_q Y_q) X^H)`` per bin."""
    XY = jnp.swapaxes(Y_sum, 0, 1) @ jnp.transpose(X, (1, 2, 0)).conj()
    return prox.neg_logdet(W - mu1 * mu2 * XY, step_size=mu1)


class PDSBSSBase(ProxBSSBase):
    """Base of PDS-type methods (parity: ssspy/bss/pdsbss.py:14-55)."""

    def __repr__(self) -> str:
        keys = ["n_penalties", "scale_restoration", "record_loss"]
        if self.scale_restoration:
            keys += ["reference_id"]
        return config_repr(self, "PDSBSS", keys)

    def __call__(self, input, n_iter: int = 100, initial_call: bool = True, **kwargs):
        self.input = jnp.asarray(input).copy()
        self._reset(**kwargs)
        self._state = self.init_state()
        self._iterate(n_iter=n_iter, initial_call=initial_call)

        if self.scale_restoration:
            self.restore_scale()
        self.output = _separate(self.input, self.demix_filter)
        return self.output


class PDSBSS(PDSBSSBase):
    """BSS via primal-dual splitting (parity: ssspy/bss/pdsbss.py:58-219)."""

    def __init__(
        self,
        mu1: float = 1,
        mu2: float = 1,
        alpha: float = None,
        relaxation: float = 1,
        penalty_fn: Optional[Callable] = None,
        prox_penalty: Callable = None,
        callbacks: Optional[Union[Callable, List[Callable]]] = None,
        scale_restoration: bool = True,
        record_loss: Optional[bool] = None,
        reference_id: int = 0,
    ) -> None:
        super().__init__(
            penalty_fn=penalty_fn,
            prox_penalty=prox_penalty,
            callbacks=callbacks,
            scale_restoration=scale_restoration,
            record_loss=record_loss,
            reference_id=reference_id,
        )

        self.mu1, self.mu2 = mu1, mu2

        if alpha is None:
            self.relaxation = relaxation
        else:
            assert relaxation == 1, "relaxation and the deprecated alpha are mutually exclusive; pass only one."
            warnings.warn("the alpha keyword is deprecated; use relaxation.", DeprecationWarning)
            self.relaxation = alpha

    def __repr__(self) -> str:
        keys = ["mu1", "mu2", "relaxation", "n_penalties", "scale_restoration", "record_loss"]
        if self.scale_restoration:
            keys += ["reference_id"]
        return config_repr(self, "PDSBSS", keys)

    def _reset(self, **kwargs) -> None:
        super()._reset(**kwargs)

        n_penalties = self.n_penalties
        n_sources = self.n_sources
        n_bins, n_frames = self.n_bins, self.n_frames

        if not hasattr(self, "dual"):
            dual = jnp.zeros(
                (n_penalties, n_sources, n_bins, n_frames), dtype=self.input.dtype
            )
        else:
            dual = None if self.dual is None else jnp.asarray(self.dual).copy()

        self.dual = dual

    # ---- state plumbing ----------------------------------------------------

    def init_state(self):
        return {"X": self.input, "W": self.demix_filter, "dual": self.dual}

    def commit_state(self, state) -> None:
        self._state = state
        self.demix_filter = state["W"]
        self.dual = state["dual"]
        self.output = _separate(state["X"], state["W"])

    def make_step(self):
        mu1, mu2 = self.mu1, self.mu2
        alpha = self.relaxation
        prox_penalties = self.prox_penalty

        def step(state):
            X, W, Y = state["X"], state["W"], state["dual"]

            W_tilde = _pds_primal(X, W, Y.sum(axis=0), mu1, mu2)
            XW = _separate(X, 2 * W_tilde - W)

            Y_tilde = []
            for q, prox_penalty in enumerate(prox_penalties):
                Z_q = Y[q] + XW
                Y_tilde.append(Z_q - prox_penalty(Z_q, step_size=1 / mu2))
            Y_tilde = jnp.stack(Y_tilde, axis=0)

            return {
                **state,
                "W": alpha * W_tilde + (1 - alpha) * W,
                "dual": alpha * Y_tilde + (1 - alpha) * Y,
            }

        return step


class MaskingPDSBSS(PDSBSSBase):
    """Masking-based PDS BSS (parity: ssspy/bss/pdsbss.py:222-412).

    The dual prox is replaced by a user mask: ``Y_tilde = Z - mask(Z) Z``.
    """

    def __init__(
        self,
        mu1: float = 1,
        mu2: float = 1,
        alpha: float = None,
        relaxation: float = 1,
        penalty_fn: Optional[Callable] = None,
        mask_fn: Callable = None,
        callbacks: Optional[Union[Callable, List[Callable]]] = None,
        scale_restoration: bool = True,
        record_loss: Optional[bool] = None,
        reference_id: int = 0,
    ) -> None:
        if penalty_fn is None:
            if record_loss is None:
                record_loss = False
            assert not record_loss, "record_loss=True needs a penalty_fn to evaluate."
        else:
            assert callable(penalty_fn), "penalty_fn must be callable."
            if record_loss is None:
                record_loss = True

        IterativeMethodBase.__init__(self, callbacks=callbacks, record_loss=record_loss)

        if mask_fn is None:
            raise ValueError("MaskingPDSBSS/MaskingADMMBSS require a mask_fn.")
        assert callable(mask_fn), "mask_fn must be callable."

        self.penalty_fn = penalty_fn
        self.mask_fn = mask_fn

        self.input = None
        self.scale_restoration = scale_restoration

        if reference_id is None and scale_restoration:
            raise ValueError("scale_restoration=True needs a reference_id channel.")
        self.reference_id = reference_id

        self.mu1, self.mu2 = mu1, mu2

        if alpha is None:
            self.relaxation = relaxation
        else:
            assert relaxation == 1, "relaxation and the deprecated alpha are mutually exclusive; pass only one."
            warnings.warn("the alpha keyword is deprecated; use relaxation.", DeprecationWarning)
            self.relaxation = alpha

    def __repr__(self) -> str:
        keys = ["mu1", "mu2", "relaxation", "scale_restoration", "record_loss"]
        if self.scale_restoration:
            keys += ["reference_id"]
        return config_repr(self, "MaskingPDSBSS", keys)

    def _reset(self, **kwargs) -> None:
        super()._reset(**kwargs)

        n_sources = self.n_sources
        n_bins, n_frames = self.n_bins, self.n_frames

        if not hasattr(self, "dual"):
            dual = jnp.zeros((n_sources, n_bins, n_frames), dtype=self.input.dtype)
        else:
            dual = None if self.dual is None else jnp.asarray(self.dual).copy()

        self.dual = dual

    @property
    def n_penalties(self):
        return 1

    def init_state(self):
        return {"X": self.input, "W": self.demix_filter, "dual": self.dual}

    def commit_state(self, state) -> None:
        self._state = state
        self.demix_filter = state["W"]
        self.dual = state["dual"]
        self.output = _separate(state["X"], state["W"])

    def make_loss(self):
        penalty_fn = self.penalty_fn

        def loss(state):
            X, W = state["X"], state["W"]
            Y = _separate(X, W)
            _, logdet = jnp.linalg.slogdet(W)
            return penalty_fn(Y) - jnp.sum(logdet)

        return loss

    def make_step(self):
        mu1, mu2 = self.mu1, self.mu2
        alpha = self.relaxation
        mask_fn = self.mask_fn

        def step(state):
            X, W, Y = state["X"], state["W"], state["dual"]

            W_tilde = _pds_primal(X, W, Y, mu1, mu2)
            XW = _separate(X, 2 * W_tilde - W)

            Z = Y + XW
            Y_tilde = Z - mask_fn(Z) * Z

            return {
                **state,
                "W": alpha * W_tilde + (1 - alpha) * W,
                "dual": alpha * Y_tilde + (1 - alpha) * Y,
            }

        return step
