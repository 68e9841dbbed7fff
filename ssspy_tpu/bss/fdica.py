"""Frequency-domain ICA (FDICA) family.

Parity target: ssspy/bss/fdica.py (GradFDICA, NaturalGradFDICA,
AuxFDICA with IP/IP1/IP2, GradLaplaceFDICA, NaturalGradLaplaceFDICA,
AuxLaplaceFDICA; bases FDICABase/GradFDICABase).

FDICA runs an independent complex ICA in every frequency bin (the
contrast is per-scalar, not per-bin-vector as in IVA), so permutation
alignment across bins follows the iteration loop
(ssspy/bss/fdica.py:239-281). The iteration itself compiles to one
``lax.scan`` XLA program; the per-bin weighted covariance is a single
einsum over (bins x sources x frames) feeding the MXU.
"""

import functools
from typing import Callable, Iterable, List, Optional, Tuple, Union

import jax.numpy as jnp

from ..algorithm import (
    MINIMAL_DISTORTION_PRINCIPLE_KEYWORDS,
    PROJECTION_BACK_KEYWORDS,
    correlation_based_permutation_solver,
    minimal_distortion_principle,
    projection_back,
)
from ..special.flooring import EPS, identity, max_flooring, resolve_flooring_spec
from ..utils.flooring import choose_flooring_fn
from ..utils.select_pair import sequential_pair_selector
from ._update_spatial_model import update_by_ip1, update_by_ip2_one_pair
from .base import IterativeMethodBase, config_repr
from .iva import _ls_demix, _separate

__all__ = [
    "FDICABase",
    "GradFDICABase",
    "GradFDICA",
    "NaturalGradFDICA",
    "AuxFDICA",
    "GradLaplaceFDICA",
    "NaturalGradLaplaceFDICA",
    "AuxLaplaceFDICA",
]

spatial_algorithms = ["IP", "IP1", "IP2"]


def _scalar_weighted_covariance(X, varphi):
    """``U[i,n] = mean_t varphi[n,i,t] x_it x_it^H`` — per-bin-scalar weights
    (FDICA's analog of the IVA hot op; reference ssspy/bss/fdica.py:1110-1126)."""
    n_frames = X.shape[-1]
    return jnp.einsum("nit,pit,qit->inpq", varphi.astype(X.dtype), X, X.conj()) / n_frames


class FDICABase(IterativeMethodBase):
    """Base class of FDICA (parity: ssspy/bss/fdica.py:32-327)."""

    def __init__(
        self,
        flooring_fn: Union[str, Callable, None] = "dtype",
        callbacks: Optional[Union[Callable, List[Callable]]] = None,
        permutation_alignment: bool = True,
        scale_restoration: Union[bool, str] = True,
        record_loss: bool = True,
        reference_id: int = 0,
    ) -> None:
        super().__init__(callbacks=callbacks, record_loss=record_loss)

        self.flooring_fn = resolve_flooring_spec(flooring_fn)
        self.input = None
        self.permutation_alignment = permutation_alignment
        self.scale_restoration = scale_restoration
        self.reference_id = reference_id

    def __repr__(self) -> str:
        keys = ["permutation_alignment", "scale_restoration", "record_loss"]
        if self.scale_restoration:
            keys += ["reference_id"]
        return config_repr(self, "FDICA", keys)

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

    def separate(self, input, demix_filter):
        """Per-bin demixing ``(M,I,T) -> (N,I,T)``."""
        if demix_filter is None:
            return None
        return _separate(jnp.asarray(input), jnp.asarray(demix_filter))

    def compute_logdet(self, demix_filter):
        _, logdet = jnp.linalg.slogdet(demix_filter)
        return logdet

    # ---- state plumbing ----------------------------------------------------

    def init_state(self):
        return {"X": self.input, "W": self.demix_filter}

    def commit_state(self, state) -> None:
        self._state = state
        self.demix_filter = state["W"]
        self.output = _separate(state["X"], state["W"])

    def make_loss(self):
        contrast_fn = self.contrast_fn

        def loss(state):
            X, W = state["X"], state["W"]
            Y = _separate(X, W)
            G = contrast_fn(Y)  # (N, I, T)
            _, logdet = jnp.linalg.slogdet(W)  # (I,)
            return jnp.sum(jnp.sum(jnp.mean(G, axis=2), axis=0) - 2 * logdet)

        return loss

    # ---- permutation alignment & scale restoration -------------------------

    def solve_permutation(self) -> None:
        permutation_alignment = self.permutation_alignment
        assert permutation_alignment, "enable permutation_alignment to use this solver."

        if type(permutation_alignment) is bool:
            permutation_alignment = "spectrogram_correlation"

        if permutation_alignment == "spectrogram_correlation":
            self.solve_permutation_by_correlation()
        else:
            raise NotImplementedError(
                f"permutation_alignment {permutation_alignment} is not implemented."
            )

    def solve_permutation_by_correlation(self, flooring_fn="self") -> None:
        flooring_fn = choose_flooring_fn(flooring_fn, method=self)
        X, W = self.input, self.demix_filter

        Y = _separate(X, W)
        Y, W = correlation_based_permutation_solver(
            jnp.swapaxes(Y, 0, 1), W, flooring_fn=flooring_fn
        )
        self.output, self.demix_filter = jnp.swapaxes(Y, 0, 1), W

    def restore_scale(self) -> None:
        scale_restoration = self.scale_restoration
        assert scale_restoration, "scale restoration is disabled on this instance."

        if type(scale_restoration) is bool:
            scale_restoration = PROJECTION_BACK_KEYWORDS[0]

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

    def _finalize(self):
        """Post-loop: permutation alignment, scale restoration, final output."""
        if self.permutation_alignment:
            self.solve_permutation()
        if self.scale_restoration:
            self.restore_scale()
        if self.demix_filter is not None:
            self.output = _separate(self.input, self.demix_filter)
        return self.output


class GradFDICABase(FDICABase):
    """Base of gradient-descent FDICA (parity: ssspy/bss/fdica.py:329-456)."""

    def __init__(
        self,
        step_size: float = 1e-1,
        contrast_fn: Callable = None,
        score_fn: Callable = None,
        flooring_fn: Union[str, Callable, None] = "dtype",
        callbacks: Optional[Union[Callable, List[Callable]]] = None,
        is_holonomic: bool = False,
        permutation_alignment: bool = True,
        scale_restoration: Union[bool, str] = True,
        record_loss: bool = True,
        reference_id: int = 0,
    ) -> None:
        super().__init__(
            flooring_fn=flooring_fn,
            callbacks=callbacks,
            permutation_alignment=permutation_alignment,
            scale_restoration=scale_restoration,
            record_loss=record_loss,
            reference_id=reference_id,
        )
        self.step_size = step_size

        if contrast_fn is None:
            raise ValueError("a contrast_fn must be provided.")
        self.contrast_fn = contrast_fn

        if score_fn is None:
            raise ValueError("a score_fn must be provided.")
        self.score_fn = score_fn

        self.is_holonomic = is_holonomic

    def __call__(self, input, n_iter: int = 100, initial_call: bool = True, **kwargs):
        self.input = jnp.asarray(input).copy()
        self._reset(**kwargs)
        self._state = self.init_state()
        self._iterate(n_iter=n_iter, initial_call=initial_call)
        return self._finalize()

    def __repr__(self) -> str:
        keys = ["step_size", "is_holonomic", "permutation_alignment", "scale_restoration", "record_loss"]
        if self.scale_restoration:
            keys += ["reference_id"]
        return config_repr(self, "GradFDICA", keys)

    def _grad_step(self, natural: bool):
        score_fn = self.score_fn
        step_size = self.step_size
        is_holonomic = self.is_holonomic

        def step(state):
            X, W = state["X"], state["W"]
            Y = _separate(X, W)
            Phi = score_fn(Y)  # (N, I, T)
            PhiY = jnp.einsum("nit,mit->inm", Phi, Y.conj()) / Y.shape[-1]
            eye = jnp.eye(W.shape[-2], dtype=W.dtype)
            direction = PhiY - eye if is_holonomic else (1 - eye) * PhiY
            right = W if natural else jnp.swapaxes(jnp.linalg.inv(W), -2, -1).conj()
            return {**state, "W": W - step_size * (direction @ right)}

        return step


class GradFDICA(GradFDICABase):
    """FDICA by gradient descent (parity: ssspy/bss/fdica.py:458-655)."""

    def make_step(self):
        return self._grad_step(natural=False)


class NaturalGradFDICA(GradFDICABase):
    """FDICA by natural gradient descent (parity: ssspy/bss/fdica.py:658-844)."""

    def __repr__(self) -> str:
        return "Natural" + super().__repr__()

    def make_step(self):
        return self._grad_step(natural=True)


class AuxFDICA(FDICABase):
    """Auxiliary-function FDICA (parity: ssspy/bss/fdica.py:846-1246).

    ``spatial_algorithm`` selects IP/IP1 (per-source sequential sweep) or
    IP2 (pairwise GEVD). The MM weight is the per-scalar
    ``G'(|y|)/(2|y|)`` (unlike IVA's per-vector weight).
    """

    def __init__(
        self,
        spatial_algorithm: str = "IP",
        contrast_fn: Callable = None,
        d_contrast_fn: Callable = None,
        flooring_fn: Union[str, Callable, None] = "dtype",
        pair_selector: Optional[Callable[[int], Iterable[Tuple[int, int]]]] = None,
        callbacks: Optional[Union[Callable, List[Callable]]] = None,
        permutation_alignment: bool = True,
        scale_restoration: Union[bool, str] = True,
        record_loss: bool = True,
        reference_id: int = 0,
    ) -> None:
        super().__init__(
            flooring_fn=flooring_fn,
            callbacks=callbacks,
            permutation_alignment=permutation_alignment,
            scale_restoration=scale_restoration,
            record_loss=record_loss,
            reference_id=reference_id,
        )

        assert spatial_algorithm in spatial_algorithms, f"unsupported option: {spatial_algorithm}."
        self.spatial_algorithm = spatial_algorithm

        if contrast_fn is None:
            raise ValueError("a contrast_fn must be provided.")
        self.contrast_fn = contrast_fn

        if d_contrast_fn is None:
            raise ValueError("a d_contrast_fn must be provided.")
        self.d_contrast_fn = d_contrast_fn

        if pair_selector is None:
            if spatial_algorithm == "IP2":
                self.pair_selector = sequential_pair_selector
        else:
            self.pair_selector = pair_selector

    def __call__(self, input, n_iter: int = 100, initial_call: bool = True, **kwargs):
        self.input = jnp.asarray(input).copy()
        self._reset(**kwargs)
        self._state = self.init_state()
        self._iterate(n_iter=n_iter, initial_call=initial_call)
        return self._finalize()

    def __repr__(self) -> str:
        keys = ["spatial_algorithm", "permutation_alignment", "scale_restoration", "record_loss"]
        if self.scale_restoration:
            keys += ["reference_id"]
        return config_repr(self, "AuxFDICA", keys)

    def _varphi(self, Y):
        Y_abs = jnp.abs(Y)
        return self.d_contrast_fn(Y_abs) / self.flooring_fn(2 * Y_abs)  # (N, I, T)

    def make_step(self):
        algo = self.spatial_algorithm
        flooring_fn = self.flooring_fn
        varphi_of = self._varphi

        if algo in ("IP", "IP1"):

            def step(state):
                X, W = state["X"], state["W"]
                Y = _separate(X, W)
                U = _scalar_weighted_covariance(X, varphi_of(Y))
                return {**state, "W": update_by_ip1(W, U, flooring_fn=flooring_fn)}

        elif algo == "IP2":
            pair_selector = self.pair_selector

            def step(state):
                X, W = state["X"], state["W"]
                n_sources = W.shape[-2]
                for m, n in pair_selector(n_sources):
                    W_mn = W[:, (m, n), :]
                    Y_mn = _separate(X, W_mn)
                    U_mn = _scalar_weighted_covariance(X, varphi_of(Y_mn))
                    W = W.at[:, (m, n), :].set(
                        update_by_ip2_one_pair(W, U_mn, pair=(m, n), flooring_fn=flooring_fn)
                    )
                return {**state, "W": W}

        else:
            raise NotImplementedError(f"unsupported option: {algo}.")

        return step


class GradLaplaceFDICA(GradFDICA):
    """Gradient FDICA, Laplace prior (parity: ssspy/bss/fdica.py:1248-1384)."""

    def __init__(
        self,
        step_size: float = 1e-1,
        flooring_fn: Union[str, Callable, None] = "dtype",
        callbacks: Optional[Union[Callable, List[Callable]]] = None,
        is_holonomic: bool = False,
        permutation_alignment: bool = True,
        scale_restoration: Union[bool, str] = True,
        record_loss: bool = True,
        reference_id: int = 0,
    ) -> None:
        def contrast_fn(y):
            return 2 * jnp.abs(y)

        def score_fn(y):
            return y / self.flooring_fn(jnp.abs(y)).astype(y.dtype)

        super().__init__(
            step_size=step_size,
            contrast_fn=contrast_fn,
            score_fn=score_fn,
            flooring_fn=flooring_fn,
            callbacks=callbacks,
            is_holonomic=is_holonomic,
            permutation_alignment=permutation_alignment,
            scale_restoration=scale_restoration,
            record_loss=record_loss,
            reference_id=reference_id,
        )

    def __repr__(self) -> str:
        keys = ["step_size", "is_holonomic", "permutation_alignment", "scale_restoration", "record_loss"]
        if self.scale_restoration:
            keys += ["reference_id"]
        return config_repr(self, "GradLaplaceFDICA", keys)


class NaturalGradLaplaceFDICA(NaturalGradFDICA):
    """Natural-gradient FDICA, Laplace prior (parity: ssspy/bss/fdica.py:1386-1524)."""

    def __init__(
        self,
        step_size: float = 1e-1,
        flooring_fn: Union[str, Callable, None] = "dtype",
        callbacks: Optional[Union[Callable, List[Callable]]] = None,
        is_holonomic: bool = False,
        permutation_alignment: bool = True,
        scale_restoration: Union[bool, str] = True,
        record_loss: bool = True,
        reference_id: int = 0,
    ) -> None:
        def contrast_fn(y):
            return 2 * jnp.abs(y)

        def score_fn(y):
            return y / self.flooring_fn(jnp.abs(y)).astype(y.dtype)

        super().__init__(
            step_size=step_size,
            contrast_fn=contrast_fn,
            score_fn=score_fn,
            flooring_fn=flooring_fn,
            callbacks=callbacks,
            is_holonomic=is_holonomic,
            permutation_alignment=permutation_alignment,
            scale_restoration=scale_restoration,
            record_loss=record_loss,
            reference_id=reference_id,
        )

    def __repr__(self) -> str:
        keys = ["step_size", "is_holonomic", "permutation_alignment", "scale_restoration", "record_loss"]
        if self.scale_restoration:
            keys += ["reference_id"]
        return config_repr(self, "NaturalGradLaplaceFDICA", keys)


class AuxLaplaceFDICA(AuxFDICA):
    """AuxFDICA with Laplace prior (parity: ssspy/bss/fdica.py:1527-1667)."""

    def __init__(
        self,
        spatial_algorithm: str = "IP",
        flooring_fn: Union[str, Callable, None] = "dtype",
        pair_selector: Optional[Callable[[int], Iterable[Tuple[int, int]]]] = None,
        callbacks: Optional[Union[Callable, List[Callable]]] = None,
        permutation_alignment: bool = True,
        scale_restoration: Union[bool, str] = True,
        record_loss: bool = True,
        reference_id: int = 0,
    ) -> None:
        def contrast_fn(y):
            return 2 * jnp.abs(y)

        def d_contrast_fn(y):
            return 2 * jnp.ones_like(y)

        super().__init__(
            spatial_algorithm=spatial_algorithm,
            contrast_fn=contrast_fn,
            d_contrast_fn=d_contrast_fn,
            flooring_fn=flooring_fn,
            pair_selector=pair_selector,
            callbacks=callbacks,
            permutation_alignment=permutation_alignment,
            scale_restoration=scale_restoration,
            record_loss=record_loss,
            reference_id=reference_id,
        )

    def __repr__(self) -> str:
        keys = ["spatial_algorithm", "permutation_alignment", "scale_restoration", "record_loss"]
        if self.scale_restoration:
            keys += ["reference_id"]
        return config_repr(self, "AuxLaplaceFDICA", keys)
