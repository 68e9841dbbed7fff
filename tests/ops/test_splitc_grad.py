"""Split-complex gradient IVA/FDICA parity vs the complex class paths."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssspy_tpu.ops.splitc import grad_laplace_fdica_step_sc, grad_laplace_iva_step_sc


def _mixture(seed=0, M=3, I=9, T=24):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((M, I, T)) + 1j * rng.standard_normal((M, I, T))


@pytest.mark.parametrize("natural", [False, True])
@pytest.mark.parametrize("is_holonomic", [False, True])
def test_grad_iva_step_matches_class(natural, is_holonomic):
    from ssspy_tpu.bss.iva import GradIVA, NaturalGradIVA

    X = _mixture()
    cls = NaturalGradIVA if natural else GradIVA

    def contrast(y):
        return 2 * jnp.linalg.norm(y, axis=1)

    def score(y):
        norm = jnp.maximum(jnp.linalg.norm(y, axis=1, keepdims=True), 1e-10)
        return y / norm

    iva = cls(
        contrast_fn=contrast,
        score_fn=score,
        is_holonomic=is_holonomic,
        scale_restoration=False,
    )
    iva(X.copy(), n_iter=3)
    W_cls = np.asarray(iva.demix_filter)

    Xs = jnp.asarray(np.stack([X.real, X.imag]))
    W0 = np.tile(np.eye(X.shape[0], dtype=complex), (X.shape[1], 1, 1))
    Ws = jnp.asarray(np.stack([W0.real, W0.imag]))
    step = jax.jit(
        functools.partial(
            grad_laplace_iva_step_sc, is_holonomic=is_holonomic, natural=natural
        )
    )
    for _ in range(3):
        Ws = step(Xs, Ws)
    W_sc = np.asarray(Ws[0]) + 1j * np.asarray(Ws[1])
    np.testing.assert_allclose(W_sc, W_cls, atol=1e-8)


@pytest.mark.parametrize("natural", [False, True])
def test_grad_fdica_step_matches_class(natural):
    from ssspy_tpu.bss.fdica import GradLaplaceFDICA, NaturalGradLaplaceFDICA

    X = _mixture(seed=1)
    cls = NaturalGradLaplaceFDICA if natural else GradLaplaceFDICA
    fdica = cls(is_holonomic=True, permutation_alignment=False, scale_restoration=False)
    fdica(X.copy(), n_iter=3)
    W_cls = np.asarray(fdica.demix_filter)

    Xs = jnp.asarray(np.stack([X.real, X.imag]))
    W0 = np.tile(np.eye(X.shape[0], dtype=complex), (X.shape[1], 1, 1))
    Ws = jnp.asarray(np.stack([W0.real, W0.imag]))
    step = jax.jit(
        functools.partial(grad_laplace_fdica_step_sc, is_holonomic=True, natural=natural)
    )
    for _ in range(3):
        Ws = step(Xs, Ws)
    W_sc = np.asarray(Ws[0]) + 1j * np.asarray(Ws[1])
    np.testing.assert_allclose(W_sc, W_cls, atol=1e-8)
