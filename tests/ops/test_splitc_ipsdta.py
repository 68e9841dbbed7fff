"""GaussIPSDTA split-complex kernel parity (x64)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ssspy_tpu.ops.splitc import gauss_ipsdta_vcd_step_sc, gmean2_sc


def test_gmean2_sc_matches_gmeanmh():
    from ssspy_tpu.linalg import gmeanmh
    from tests.helpers import random_hermitian

    rng = np.random.default_rng(0)
    A = random_hermitian(rng, (5, 4, 4), psd=True)
    B = random_hermitian(rng, (5, 4, 4), psd=True)
    G_ref = np.asarray(gmeanmh(jnp.asarray(A), jnp.asarray(B), type=2))
    Gr, Gi = gmean2_sc(
        jnp.asarray(A.real), jnp.asarray(A.imag), jnp.asarray(B.real), jnp.asarray(B.imag)
    )
    np.testing.assert_allclose(np.asarray(Gr) + 1j * np.asarray(Gi), G_ref, atol=1e-9)


def _fixture(seed, M=2, I=8, T_frames=12, K=2, n_blocks=2):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((M, I, T_frames)) + 1j * rng.standard_normal(
        (M, I, T_frames)
    )
    n_remains = I % n_blocks
    J = I // n_blocks
    T0 = rng.random((M, K, n_blocks - n_remains, J))[..., None] * np.eye(J)
    parts = [T0]
    if n_remains:
        T1 = rng.random((M, K, n_remains, J + 1))[..., None] * np.eye(J + 1)
        parts.append(T1)
    V0 = np.maximum(rng.random((M, K, T_frames)), 1e-10)
    return X, parts, V0


def _run_sc(X, parts, V0, n_iter, **kwargs):
    M, I = X.shape[0], X.shape[1]
    Xs = jnp.asarray(np.stack([X.real, X.imag]))
    W0 = np.tile(np.eye(M, dtype=complex), (I, 1, 1))
    Ws = jnp.asarray(np.stack([W0.real, W0.imag]))
    T_parts = [jnp.asarray(np.stack([p.real, p.imag])) for p in parts]
    V = jnp.asarray(V0)
    step = jax.jit(
        functools.partial(gauss_ipsdta_vcd_step_sc, psd_impl="eigh", **kwargs)
    )
    for _ in range(n_iter):
        Ws, T_parts, V = step(Xs, Ws, T_parts, V)
    W = np.asarray(Ws[0]) + 1j * np.asarray(Ws[1])
    return W, [np.asarray(p[0]) + 1j * np.asarray(p[1]) for p in T_parts], np.asarray(V)


def _run_class(X, parts, V0, n_iter, n_blocks):
    from ssspy_tpu.bss.ipsdta import GaussIPSDTA

    basis = tuple(p.astype(complex) for p in parts) if len(parts) > 1 else parts[0].astype(complex)
    ipsdta = GaussIPSDTA(
        n_basis=V0.shape[1],
        n_blocks=n_blocks,
        scale_restoration=False,
        record_loss=False,
        rng=np.random.default_rng(0),
    )
    # source_normalization normalizes the warm-started basis at reset,
    # exactly like the kernel's first normalize; pre-normalize both? No:
    # the class normalizes at init, the kernel normalizes after the first
    # update. Disable init normalization effects by pre-normalizing here.
    ipsdta(X.copy(), n_iter=n_iter, basis=basis, activation=V0.copy())
    return np.asarray(ipsdta.demix_filter), ipsdta.basis, np.asarray(ipsdta.activation)


def _prenormalize(parts, V0):
    trace = sum(
        np.real(np.trace(p, axis1=-2, axis2=-1)).sum(axis=-1) for p in parts
    )  # (N, K)
    parts = [p / trace[:, :, None, None, None] for p in parts]
    return parts, V0 * trace[:, :, None]


def test_gauss_ipsdta_vcd_step_matches_class_even_blocks():
    X, parts, V0 = _fixture(seed=1, I=8, n_blocks=2)
    parts_n, V_n = _prenormalize(parts, V0)

    W_cls, T_cls, V_cls = _run_class(X, parts, V0, n_iter=2, n_blocks=2)
    W_sc, T_sc, V_sc = _run_sc(X, parts_n, V_n, n_iter=2)

    np.testing.assert_allclose(W_sc, W_cls, atol=1e-8)
    np.testing.assert_allclose(V_sc, V_cls, atol=1e-8)
    np.testing.assert_allclose(T_sc[0], np.asarray(T_cls), atol=1e-8)


def test_gauss_ipsdta_vcd_step_matches_class_remainder_blocks():
    X, parts, V0 = _fixture(seed=2, I=9, n_blocks=2, M=3)
    assert len(parts) == 2
    parts_n, V_n = _prenormalize(parts, V0)

    W_cls, T_cls, V_cls = _run_class(X, parts, V0, n_iter=2, n_blocks=2)
    W_sc, T_sc, V_sc = _run_sc(X, parts_n, V_n, n_iter=2)

    np.testing.assert_allclose(W_sc, W_cls, atol=1e-8)
    np.testing.assert_allclose(V_sc, V_cls, atol=1e-8)
    for p_sc, p_cls in zip(T_sc, T_cls):
        np.testing.assert_allclose(p_sc, np.asarray(p_cls), atol=1e-8)


def _run_sc_t(X, parts, V0, n_iter, dof):
    from ssspy_tpu.ops.splitc import ipsdta_vcd_step_sc

    M, I = X.shape[0], X.shape[1]
    Xs = jnp.asarray(np.stack([X.real, X.imag]))
    W0 = np.tile(np.eye(M, dtype=complex), (I, 1, 1))
    Ws = jnp.asarray(np.stack([W0.real, W0.imag]))
    T_parts = [jnp.asarray(np.stack([p.real, p.imag])) for p in parts]
    V = jnp.asarray(V0)
    step = jax.jit(
        functools.partial(ipsdta_vcd_step_sc, dof=dof, psd_impl="eigh")
    )
    for _ in range(n_iter):
        Ws, T_parts, V = step(Xs, Ws, T_parts, V)
    W = np.asarray(Ws[0]) + 1j * np.asarray(Ws[1])
    return W, [np.asarray(p[0]) + 1j * np.asarray(p[1]) for p in T_parts], np.asarray(V)


def test_t_ipsdta_vcd_step_matches_class():
    from ssspy_tpu.bss.ipsdta import TIPSDTA

    X, parts, V0 = _fixture(seed=3, I=9, n_blocks=2, M=3)
    parts_n, V_n = _prenormalize(parts, V0)

    basis = tuple(p.astype(complex) for p in parts) if len(parts) > 1 else parts[0].astype(complex)
    ipsdta = TIPSDTA(
        n_basis=V0.shape[1], n_blocks=2, dof=5,
        scale_restoration=False, record_loss=False, rng=np.random.default_rng(0),
    )
    ipsdta(X.copy(), n_iter=2, basis=basis, activation=V0.copy())
    W_cls = np.asarray(ipsdta.demix_filter)
    V_cls = np.asarray(ipsdta.activation)

    W_sc, T_sc, V_sc = _run_sc_t(X, parts_n, V_n, n_iter=2, dof=5.0)
    np.testing.assert_allclose(W_sc, W_cls, atol=1e-8)
    np.testing.assert_allclose(V_sc, V_cls, atol=1e-8)
    for p_sc, p_cls in zip(T_sc, ipsdta.basis):
        np.testing.assert_allclose(p_sc, np.asarray(p_cls), atol=1e-8)
