"""ADMM-based BSS.

Parity target: ssspy/bss/admmbss.py (ADMMBSS, MaskingADMMBSS). One
iteration: quadratic W-subproblem (batched solve over bins,
ssspy/bss/admmbss.py:220-257), relaxed averaging, neg-logdet prox on
the filter auxiliary, penalty prox (or masking) on the spectrogram
auxiliary, dual ascent. Compiles to one ``lax.scan``.
"""

import warnings
from typing import Callable, List, Optional, Union

import jax.numpy as jnp

from ..linalg import prox
from ..linalg._solve import solve
from .base import IterativeMethodBase, config_repr
from .iva import _separate
from .proxbss import ProxBSSBase

EPS = 1e-10

__all__ = ["ADMMBSS", "MaskingADMMBSS"]


def _pop_deprecated_aux(kwargs):
    if "aux1" in kwargs.keys():
        warnings.warn("the aux1 keyword is deprecated; use auxiliary1.", DeprecationWarning)
        kwargs["auxiliary1"] = kwargs.pop("aux1")
    if "aux2" in kwargs.keys():
        warnings.warn("the aux2 keyword is deprecated; use auxiliary2.", DeprecationWarning)
        kwargs["auxiliary2"] = kwargs.pop("aux2")
    return kwargs


class ADMMBSSBase(ProxBSSBase):
    """Base of ADMM-type methods (parity: ssspy/bss/admmbss.py:15-52)."""

    def __repr__(self) -> str:
        keys = ["n_penalties", "scale_restoration", "record_loss"]
        if self.scale_restoration:
            keys += ["reference_id"]
        return config_repr(self, "ADMMBSS", keys)

    def __call__(self, input, n_iter: int = 100, initial_call: bool = True, **kwargs):
        self.input = jnp.asarray(input).copy()
        self._reset(**kwargs)
        self._state = self.init_state()
        self._iterate(n_iter=n_iter, initial_call=initial_call)

        if self.scale_restoration:
            self.restore_scale()
        self.output = _separate(self.input, self.demix_filter)
        return self.output

    def init_state(self):
        return {
            "X": self.input,
            "W": self.demix_filter,
            "auxiliary1": self.auxiliary1,
            "auxiliary2": self.auxiliary2,
            "dual1": self.dual1,
            "dual2": self.dual2,
        }

    def commit_state(self, state) -> None:
        self._state = state
        self.demix_filter = state["W"]
        self.auxiliary1, self.auxiliary2 = state["auxiliary1"], state["auxiliary2"]
        self.dual1, self.dual2 = state["dual1"], state["dual2"]
        self.output = _separate(state["X"], state["W"])


class ADMMBSS(ADMMBSSBase):
    """BSS via ADMM (parity: ssspy/bss/admmbss.py:55-257)."""

    def __init__(
        self,
        rho: float = 1,
        alpha: float = None,
        relaxation: float = 1,
        penalty_fn: Callable = None,
        prox_penalty: Callable = None,
        callbacks: Optional[Union[Callable, List[Callable]]] = None,
        scale_restoration: bool = True,
        record_loss: bool = True,
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

        self.rho = rho

        if alpha is None:
            self.relaxation = relaxation
        else:
            assert relaxation == 1, "relaxation and the deprecated alpha are mutually exclusive; pass only one."
            warnings.warn("the alpha keyword is deprecated; use relaxation.", DeprecationWarning)
            self.relaxation = alpha

    def __repr__(self) -> str:
        keys = ["rho", "relaxation", "n_penalties", "scale_restoration", "record_loss"]
        if self.scale_restoration:
            keys += ["reference_id"]
        return config_repr(self, "ADMMBSS", keys)

    def _reset(self, **kwargs) -> None:
        kwargs = _pop_deprecated_aux(kwargs)
        super()._reset(**kwargs)

        n_penalties = self.n_penalties
        n_sources, n_channels = self.n_sources, self.n_channels
        n_bins, n_frames = self.n_bins, self.n_frames
        dtype = self.input.dtype

        if not hasattr(self, "auxiliary1"):
            self.auxiliary1 = jnp.zeros((n_bins, n_sources, n_channels), dtype=dtype)
        else:
            self.auxiliary1 = jnp.asarray(self.auxiliary1).copy()

        if not hasattr(self, "auxiliary2"):
            self.auxiliary2 = jnp.zeros(
                (n_penalties, n_sources, n_bins, n_frames), dtype=dtype
            )
        else:
            self.auxiliary2 = jnp.asarray(self.auxiliary2).copy()

        if not hasattr(self, "dual1"):
            self.dual1 = jnp.zeros((n_bins, n_sources, n_channels), dtype=dtype)
        else:
            self.dual1 = jnp.asarray(self.dual1).copy()

        if not hasattr(self, "dual2"):
            self.dual2 = jnp.zeros((n_penalties, n_sources, n_bins, n_frames), dtype=dtype)
        else:
            self.dual2 = jnp.asarray(self.dual2).copy()

    def make_step(self):
        n_penalties = self.n_penalties
        rho, alpha = self.rho, self.relaxation
        prox_penalties = self.prox_penalty

        def step(state):
            X = state["X"]
            V, V_tilde = state["auxiliary1"], state["auxiliary2"]
            Y, Y_tilde = state["dual1"], state["dual2"]

            n_channels = X.shape[0]
            Xb_conj = jnp.transpose(X, (1, 0, 2)).conj()  # (I, M, T)
            XX = Xb_conj @ jnp.transpose(X, (1, 2, 0))  # (I, M, M)
            E = jnp.eye(n_channels, dtype=X.dtype)

            VY = V - Y
            VY_tilde = jnp.sum(V_tilde - Y_tilde, axis=0)  # (N, I, T)
            XVY_tilde = Xb_conj @ jnp.transpose(VY_tilde, (1, 2, 0))  # (I, M, N)

            W = solve(n_penalties * XX + E, VY + jnp.swapaxes(XVY_tilde, -2, -1))
            XW = _separate(X, W)

            U = alpha * W + (1 - alpha) * V
            U_tilde = alpha * XW + (1 - alpha) * V_tilde

            V = prox.neg_logdet(U + Y, step_size=1 / rho)

            V_tilde_new = []
            for q, prox_penalty in enumerate(prox_penalties):
                V_tilde_new.append(prox_penalty(U_tilde[q] + Y_tilde[q], step_size=1 / rho))
            V_tilde_new = jnp.stack(V_tilde_new, axis=0)

            Y = Y + U - V
            Y_tilde = Y_tilde + U_tilde - V_tilde_new

            return {
                **state,
                "W": W,
                "auxiliary1": V,
                "auxiliary2": V_tilde_new,
                "dual1": Y,
                "dual2": Y_tilde,
            }

        return step


class MaskingADMMBSS(ADMMBSSBase):
    """Masking-based ADMM BSS (parity: ssspy/bss/admmbss.py:260-442)."""

    def __init__(
        self,
        rho: float = 1,
        alpha: float = None,
        relaxation: float = 1,
        penalty_fn: Callable = None,
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

        self.rho = rho

        if alpha is None:
            self.relaxation = relaxation
        else:
            assert relaxation == 1, "relaxation and the deprecated alpha are mutually exclusive; pass only one."
            warnings.warn("the alpha keyword is deprecated; use relaxation.", DeprecationWarning)
            self.relaxation = alpha

    def __repr__(self) -> str:
        keys = ["rho", "relaxation", "scale_restoration", "record_loss"]
        if self.scale_restoration:
            keys += ["reference_id"]
        return config_repr(self, "MaskingADMMBSS", keys)

    def _reset(self, **kwargs) -> None:
        kwargs = _pop_deprecated_aux(kwargs)
        super()._reset(**kwargs)

        n_sources, n_channels = self.n_sources, self.n_channels
        n_bins, n_frames = self.n_bins, self.n_frames
        dtype = self.input.dtype

        if not hasattr(self, "auxiliary1"):
            self.auxiliary1 = jnp.zeros((n_bins, n_sources, n_channels), dtype=dtype)
        else:
            self.auxiliary1 = jnp.asarray(self.auxiliary1).copy()

        if not hasattr(self, "auxiliary2"):
            self.auxiliary2 = jnp.zeros((n_sources, n_bins, n_frames), dtype=dtype)
        else:
            self.auxiliary2 = jnp.asarray(self.auxiliary2).copy()

        if not hasattr(self, "dual1"):
            self.dual1 = jnp.zeros((n_bins, n_sources, n_channels), dtype=dtype)
        else:
            self.dual1 = jnp.asarray(self.dual1).copy()

        if not hasattr(self, "dual2"):
            self.dual2 = jnp.zeros((n_sources, n_bins, n_frames), dtype=dtype)
        else:
            self.dual2 = jnp.asarray(self.dual2).copy()

    @property
    def n_penalties(self) -> int:
        return 1

    def make_loss(self):
        penalty_fn = self.penalty_fn

        def loss(state):
            X, W = state["X"], state["W"]
            Y = _separate(X, W)
            _, logdet = jnp.linalg.slogdet(W)
            return penalty_fn(Y) - jnp.sum(logdet)

        return loss

    def make_step(self):
        rho, alpha = self.rho, self.relaxation
        mask_fn = self.mask_fn

        def step(state):
            X = state["X"]
            V, V_tilde = state["auxiliary1"], state["auxiliary2"]
            Y, Y_tilde = state["dual1"], state["dual2"]

            n_channels = X.shape[0]
            Xb_conj = jnp.transpose(X, (1, 0, 2)).conj()
            XX = Xb_conj @ jnp.transpose(X, (1, 2, 0))
            E = jnp.eye(n_channels, dtype=X.dtype)

            VY = V - Y
            VY_tilde = V_tilde - Y_tilde
            XVY_tilde = Xb_conj @ jnp.transpose(VY_tilde, (1, 2, 0))

            W = solve(XX + E, VY + jnp.swapaxes(XVY_tilde, -2, -1))
            XW = _separate(X, W)

            U = alpha * W + (1 - alpha) * V
            U_tilde = alpha * XW + (1 - alpha) * V_tilde
            V = prox.neg_logdet(U + Y, step_size=1 / rho)
            V_tilde_new = mask_fn(U_tilde + Y_tilde) * (U_tilde + Y_tilde)
            Y = Y + U - V
            Y_tilde = Y_tilde + U_tilde - V_tilde_new

            return {
                **state,
                "W": W,
                "auxiliary1": V,
                "auxiliary2": V_tilde_new,
                "dual1": Y,
                "dual2": Y_tilde,
            }

        return step
