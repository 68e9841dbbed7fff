"""Split-complex AuxFDICA and FastGaussMNMF parity vs the complex class path."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ssspy_tpu.ops.splitc import (
    aux_laplace_fdica_ip1_step_sc,
    aux_laplace_fdica_ip2_step_sc,
    fast_gauss_mnmf_step_sc,
)


def _fdica_class(algo):
    from ssspy_tpu.bss.fdica import AuxFDICA

    return AuxFDICA(
        spatial_algorithm=algo,
        contrast_fn=lambda y: 2 * jnp.abs(y),
        d_contrast_fn=lambda y: 2 * jnp.ones_like(y),
        permutation_alignment=False,
        scale_restoration=False,
    )


def _mixture(seed, M=3, I=9, T=24):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((M, I, T)) + 1j * rng.standard_normal((M, I, T))


def _run_sc(step, X, n_iter):
    I, M = X.shape[1], X.shape[0]
    Xs = jnp.asarray(np.stack([X.real, X.imag]))
    W0 = np.tile(np.eye(M, dtype=complex), (I, 1, 1))
    Ws = jnp.asarray(np.stack([W0.real, W0.imag]))
    step = jax.jit(step)
    for _ in range(n_iter):
        Ws = step(Xs, Ws)
    return np.asarray(Ws[0]) + 1j * np.asarray(Ws[1])


def test_aux_fdica_ip1_step_matches_class():
    X = _mixture(0)
    fdica = _fdica_class("IP1")
    fdica(X.copy(), n_iter=3)
    # pin the reference eps (the SC default is the f32-calibrated 1e-6)
    W_sc = _run_sc(functools.partial(aux_laplace_fdica_ip1_step_sc, eps=1e-10), X, 3)
    np.testing.assert_allclose(W_sc, np.asarray(fdica.demix_filter), atol=1e-8)


def test_aux_fdica_ip2_step_matches_class():
    X = _mixture(1, M=4)
    fdica = _fdica_class("IP2")
    fdica(X.copy(), n_iter=3)
    W_sc = _run_sc(functools.partial(aux_laplace_fdica_ip2_step_sc, eps=1e-10), X, 3)
    np.testing.assert_allclose(W_sc, np.asarray(fdica.demix_filter), atol=1e-8)


def test_fast_gauss_mnmf_step_matches_class():
    from ssspy_tpu.bss.mnmf import FastGaussMNMF

    rng = np.random.default_rng(7)
    M, I, T_frames, K = 3, 9, 20, 2
    X = _mixture(2, M=M, I=I, T=T_frames)
    T0 = rng.random((M, I, K)) + 0.1
    V0 = rng.random((M, K, T_frames)) + 0.1
    D0 = rng.random((I, M, M)) + 0.1

    mnmf = FastGaussMNMF(
        n_basis=K,
        diagonalizer_algorithm="IP1",
        partitioning=False,
        normalization=True,
    )
    mnmf(
        X.copy(),
        n_iter=3,
        basis=T0.copy(),
        activation=V0.copy(),
        spatial=D0.copy(),
    )

    Xs = jnp.asarray(np.stack([X.real, X.imag]))
    Q0 = np.tile(np.eye(M, dtype=complex), (I, 1, 1))
    Qs = jnp.asarray(np.stack([Q0.real, Q0.imag]))
    Tb, Vb, Db = jnp.asarray(T0), jnp.asarray(V0), jnp.asarray(D0)
    step = jax.jit(functools.partial(fast_gauss_mnmf_step_sc, eps=1e-10))
    for _ in range(3):
        Qs, Tb, Vb, Db = step(Xs, Qs, Tb, Vb, Db)

    Q_sc = np.asarray(Qs[0]) + 1j * np.asarray(Qs[1])
    np.testing.assert_allclose(Q_sc, np.asarray(mnmf.diagonalizer), atol=1e-8)
    np.testing.assert_allclose(np.asarray(Tb), np.asarray(mnmf.basis), atol=1e-8)
    np.testing.assert_allclose(np.asarray(Vb), np.asarray(mnmf.activation), atol=1e-8)
    np.testing.assert_allclose(np.asarray(Db), np.asarray(mnmf.spatial), atol=1e-8)


def test_fast_gauss_mnmf_ip2_step_matches_class():
    from ssspy_tpu.bss.mnmf import FastGaussMNMF

    rng = np.random.default_rng(8)
    M, I, T_frames, K = 3, 9, 20, 2
    X = _mixture(3, M=M, I=I, T=T_frames)
    T0 = rng.random((M, I, K)) + 0.1
    V0 = rng.random((M, K, T_frames)) + 0.1
    D0 = rng.random((I, M, M)) + 0.1

    mnmf = FastGaussMNMF(
        n_basis=K, diagonalizer_algorithm="IP2", partitioning=False, normalization=True
    )
    mnmf(X.copy(), n_iter=3, basis=T0.copy(), activation=V0.copy(), spatial=D0.copy())

    Xs = jnp.asarray(np.stack([X.real, X.imag]))
    Q0 = np.tile(np.eye(M, dtype=complex), (I, 1, 1))
    Qs = jnp.asarray(np.stack([Q0.real, Q0.imag]))
    Tb, Vb, Db = jnp.asarray(T0), jnp.asarray(V0), jnp.asarray(D0)
    step = jax.jit(functools.partial(fast_gauss_mnmf_step_sc, eps=1e-10, diagonalizer="IP2"))
    for _ in range(3):
        Qs, Tb, Vb, Db = step(Xs, Qs, Tb, Vb, Db)

    Q_sc = np.asarray(Qs[0]) + 1j * np.asarray(Qs[1])
    np.testing.assert_allclose(Q_sc, np.asarray(mnmf.diagonalizer), atol=1e-8)
    np.testing.assert_allclose(np.asarray(Db), np.asarray(mnmf.spatial), atol=1e-8)
