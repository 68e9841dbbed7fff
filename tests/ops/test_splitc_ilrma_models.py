"""Generic ILRMA source-model engine parity vs the class paths (x64)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ssspy_tpu.ops.splitc import (
    gauss_ilrma_ip1_step_sc,
    ilrma_ip_step_sc,
    ilrma_iss_step_sc,
)


def _fixture(seed=5, M=2, I=9, T_frames=20, K=3):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((M, I, T_frames)) + 1j * rng.standard_normal(
        (M, I, T_frames)
    )
    T0 = rng.random((M, I, K)) + 0.1
    V0 = rng.random((M, K, T_frames)) + 0.1
    return X, T0, V0


def _run_ip(X, T0, V0, n_iter, **kwargs):
    M, I = X.shape[0], X.shape[1]
    Xs = jnp.asarray(np.stack([X.real, X.imag]))
    W0 = np.tile(np.eye(M, dtype=complex), (I, 1, 1))
    Ws = jnp.asarray(np.stack([W0.real, W0.imag]))
    Tb, Vb = jnp.asarray(T0), jnp.asarray(V0)
    step = jax.jit(functools.partial(ilrma_ip_step_sc, eps=1e-10, **kwargs))
    for _ in range(n_iter):
        Ws, Tb, Vb = step(Xs, Ws, Tb, Vb)
    return np.asarray(Ws[0]) + 1j * np.asarray(Ws[1]), np.asarray(Tb), np.asarray(Vb)


def _run_iss(X, T0, V0, n_iter, **kwargs):
    Ys = jnp.asarray(np.stack([X.real, X.imag]))
    Tb, Vb = jnp.asarray(T0), jnp.asarray(V0)
    step = jax.jit(functools.partial(ilrma_iss_step_sc, eps=1e-10, **kwargs))
    for _ in range(n_iter):
        Ys, Tb, Vb = step(Ys, Tb, Vb)
    return np.asarray(Ys[0]) + 1j * np.asarray(Ys[1]), np.asarray(Tb), np.asarray(Vb)


def test_generic_gauss_matches_specialized_ip1():
    X, T0, V0 = _fixture()
    W_gen, T_gen, V_gen = _run_ip(X, T0, V0, 3, model="gauss", spatial="IP1")

    Xs = jnp.asarray(np.stack([X.real, X.imag]))
    W0 = np.tile(np.eye(X.shape[0], dtype=complex), (X.shape[1], 1, 1))
    Ws = jnp.asarray(np.stack([W0.real, W0.imag]))
    Tb, Vb = jnp.asarray(T0), jnp.asarray(V0)
    step = jax.jit(functools.partial(gauss_ilrma_ip1_step_sc, eps=1e-10))
    for _ in range(3):
        Ws, Tb, Vb = step(Xs, Ws, Tb, Vb)
    W_spec = np.asarray(Ws[0]) + 1j * np.asarray(Ws[1])

    np.testing.assert_allclose(W_gen, W_spec, atol=1e-12)
    np.testing.assert_allclose(T_gen, np.asarray(Tb), atol=1e-12)


def test_t_ilrma_ip1_matches_class():
    from ssspy_tpu.bss.ilrma import TILRMA

    X, T0, V0 = _fixture(seed=6)
    ilrma = TILRMA(n_basis=T0.shape[-1], dof=1000, spatial_algorithm="IP", scale_restoration=False)
    ilrma(X.copy(), n_iter=3, basis=T0.copy(), activation=V0.copy())

    W_sc, T_sc, V_sc = _run_ip(X, T0, V0, 3, model="t", spatial="IP1", dof=1000.0)
    np.testing.assert_allclose(W_sc, np.asarray(ilrma.demix_filter), atol=1e-8)
    np.testing.assert_allclose(T_sc, np.asarray(ilrma.basis), atol=1e-8)
    np.testing.assert_allclose(V_sc, np.asarray(ilrma.activation), atol=1e-8)


def test_t_ilrma_ip2_me_matches_class():
    from ssspy_tpu.bss.ilrma import TILRMA

    X, T0, V0 = _fixture(seed=7, M=3)
    ilrma = TILRMA(
        n_basis=T0.shape[-1],
        dof=5,
        spatial_algorithm="IP2",
        source_algorithm="ME",
        scale_restoration=False,
    )
    ilrma(X.copy(), n_iter=3, basis=T0.copy(), activation=V0.copy())

    W_sc, T_sc, _ = _run_ip(X, T0, V0, 3, model="t", spatial="IP2", dof=5.0, me=True)
    np.testing.assert_allclose(W_sc, np.asarray(ilrma.demix_filter), atol=1e-8)
    np.testing.assert_allclose(T_sc, np.asarray(ilrma.basis), atol=1e-8)


def test_t_ilrma_iss1_matches_class():
    from ssspy_tpu.bss.ilrma import TILRMA

    X, T0, V0 = _fixture(seed=8)
    ilrma = TILRMA(n_basis=T0.shape[-1], dof=5, spatial_algorithm="ISS", scale_restoration=False)
    ilrma(X.copy(), n_iter=3, basis=T0.copy(), activation=V0.copy())

    Y_sc, T_sc, _ = _run_iss(X, T0, V0, 3, model="t", spatial="ISS1", dof=5.0)
    np.testing.assert_allclose(Y_sc, np.asarray(ilrma.output), atol=1e-8)
    np.testing.assert_allclose(T_sc, np.asarray(ilrma.basis), atol=1e-8)


def test_ggd_ilrma_ip1_matches_class():
    from ssspy_tpu.bss.ilrma import GGDILRMA

    X, T0, V0 = _fixture(seed=9)
    ilrma = GGDILRMA(
        n_basis=T0.shape[-1], beta=1.5, spatial_algorithm="IP", scale_restoration=False
    )
    ilrma(X.copy(), n_iter=3, basis=T0.copy(), activation=V0.copy())

    W_sc, T_sc, V_sc = _run_ip(X, T0, V0, 3, model="ggd", spatial="IP1", shape=1.5)
    np.testing.assert_allclose(W_sc, np.asarray(ilrma.demix_filter), atol=1e-8)
    np.testing.assert_allclose(T_sc, np.asarray(ilrma.basis), atol=1e-8)
    np.testing.assert_allclose(V_sc, np.asarray(ilrma.activation), atol=1e-8)


def test_ggd_ilrma_iss2_matches_class():
    from ssspy_tpu.bss.ilrma import GGDILRMA

    X, T0, V0 = _fixture(seed=10, M=3)
    ilrma = GGDILRMA(
        n_basis=T0.shape[-1], beta=1.2, spatial_algorithm="ISS2", scale_restoration=False
    )
    ilrma(X.copy(), n_iter=3, basis=T0.copy(), activation=V0.copy())

    Y_sc, T_sc, _ = _run_iss(X, T0, V0, 3, model="ggd", spatial="ISS2", shape=1.2)
    np.testing.assert_allclose(Y_sc, np.asarray(ilrma.output), atol=1e-8)
    np.testing.assert_allclose(T_sc, np.asarray(ilrma.basis), atol=1e-8)


def test_ggd_ilrma_domain1_matches_class():
    """Non-default domain exercises the p-dependent exponents."""
    from ssspy_tpu.bss.ilrma import GGDILRMA

    X, T0, V0 = _fixture(seed=11)
    ilrma = GGDILRMA(
        n_basis=T0.shape[-1],
        beta=1.8,
        domain=1.0,
        spatial_algorithm="IP",
        scale_restoration=False,
    )
    ilrma(X.copy(), n_iter=3, basis=T0.copy(), activation=V0.copy())

    W_sc, T_sc, _ = _run_ip(X, T0, V0, 3, model="ggd", spatial="IP1", shape=1.8, domain=1.0)
    np.testing.assert_allclose(W_sc, np.asarray(ilrma.demix_filter), atol=1e-8)
    np.testing.assert_allclose(T_sc, np.asarray(ilrma.basis), atol=1e-8)


def test_gauss_ilrma_partitioning_ip1_matches_class():
    from ssspy_tpu.bss.ilrma import GaussILRMA

    rng = np.random.default_rng(12)
    M, I, T_frames, K = 2, 9, 20, 3
    X = rng.standard_normal((M, I, T_frames)) + 1j * rng.standard_normal(
        (M, I, T_frames)
    )
    T0 = rng.random((I, K)) + 0.1
    V0 = rng.random((K, T_frames)) + 0.1
    Z0 = rng.random((M, K))
    Z0 = Z0 / Z0.sum(axis=0)

    ilrma = GaussILRMA(
        n_basis=K, spatial_algorithm="IP", partitioning=True, scale_restoration=False
    )
    ilrma(X.copy(), n_iter=3, basis=T0.copy(), activation=V0.copy(), latent=Z0.copy())

    Xs = jnp.asarray(np.stack([X.real, X.imag]))
    W0 = np.tile(np.eye(M, dtype=complex), (I, 1, 1))
    Ws = jnp.asarray(np.stack([W0.real, W0.imag]))
    T, V, Z = jnp.asarray(T0), jnp.asarray(V0), jnp.asarray(Z0)
    from ssspy_tpu.ops.splitc import ilrma_ip_step_sc

    step = jax.jit(functools.partial(ilrma_ip_step_sc, eps=1e-10, spatial="IP1"))
    for _ in range(3):
        Ws, T, V, Z = step(Xs, Ws, T, V, Z)

    W_sc = np.asarray(Ws[0]) + 1j * np.asarray(Ws[1])
    np.testing.assert_allclose(W_sc, np.asarray(ilrma.demix_filter), atol=1e-8)
    np.testing.assert_allclose(np.asarray(T), np.asarray(ilrma.basis), atol=1e-8)
    np.testing.assert_allclose(np.asarray(Z), np.asarray(ilrma.latent), atol=1e-8)


def test_gauss_ilrma_partitioning_iss1_matches_class():
    from ssspy_tpu.bss.ilrma import GaussILRMA

    rng = np.random.default_rng(13)
    M, I, T_frames, K = 3, 9, 20, 2
    X = rng.standard_normal((M, I, T_frames)) + 1j * rng.standard_normal(
        (M, I, T_frames)
    )
    T0 = rng.random((I, K)) + 0.1
    V0 = rng.random((K, T_frames)) + 0.1
    Z0 = rng.random((M, K))
    Z0 = Z0 / Z0.sum(axis=0)

    ilrma = GaussILRMA(
        n_basis=K, spatial_algorithm="ISS", partitioning=True, scale_restoration=False
    )
    ilrma(X.copy(), n_iter=3, basis=T0.copy(), activation=V0.copy(), latent=Z0.copy())

    from ssspy_tpu.ops.splitc import ilrma_iss_step_sc

    Ys = jnp.asarray(np.stack([X.real, X.imag]))
    T, V, Z = jnp.asarray(T0), jnp.asarray(V0), jnp.asarray(Z0)
    step = jax.jit(functools.partial(ilrma_iss_step_sc, eps=1e-10, spatial="ISS1"))
    for _ in range(3):
        Ys, T, V, Z = step(Ys, T, V, Z)

    Y_sc = np.asarray(Ys[0]) + 1j * np.asarray(Ys[1])
    np.testing.assert_allclose(Y_sc, np.asarray(ilrma.output), atol=1e-8)
    np.testing.assert_allclose(np.asarray(Z), np.asarray(ilrma.latent), atol=1e-8)
