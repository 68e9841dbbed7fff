"""FastIVA/FasterIVA split-complex kernel parity (x64)."""

import jax
import jax.numpy as jnp
import numpy as np

from ssspy_tpu.ops.splitc import (
    _polar_sc,
    fast_iva_step_sc,
    faster_iva_step_sc,
    whiten_sc,
)
from ssspy_tpu.transform import whiten


def _laplace_contrasts():
    return dict(
        contrast_fn=lambda y: 2 * jnp.linalg.norm(y, axis=1),
        d_contrast_fn=lambda y: 2 * jnp.ones_like(y),
        dd_contrast_fn=lambda y: jnp.zeros_like(y),
    )


def _mixture(seed=0, M=3, I=9, T=40):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((M, I, T)) + 1j * rng.standard_normal((M, I, T))


def test_polar_sc_matches_svd():
    rng = np.random.default_rng(1)
    W = rng.standard_normal((7, 4, 4)) + 1j * rng.standard_normal((7, 4, 4))
    Or, Oi = _polar_sc(jnp.asarray(W.real), jnp.asarray(W.imag))
    u, _, vh = np.linalg.svd(W)
    np.testing.assert_allclose(np.asarray(Or) + 1j * np.asarray(Oi), u @ vh, atol=1e-10)


def test_whiten_sc_whitens_and_matches_up_to_phase():
    X = _mixture(seed=2)
    Zs = whiten_sc(jnp.asarray(np.stack([X.real, X.imag])))
    Z = np.asarray(Zs[0]) + 1j * np.asarray(Zs[1])  # (M, I, T)

    # sample covariance per bin must be the identity
    cov = np.einsum("mit,nit->imn", Z, Z.conj()) / X.shape[-1]
    np.testing.assert_allclose(cov, np.tile(np.eye(X.shape[0]), (X.shape[1], 1, 1)), atol=1e-8)

    # same components as transform.whiten up to a per-component phase
    Z_ref = np.asarray(whiten(jnp.asarray(X)))
    ratio = Z / np.where(np.abs(Z_ref) > 1e-12, Z_ref, 1)
    phase = ratio / np.abs(ratio)
    # the phase must be constant over frames for each (component, bin)
    np.testing.assert_allclose(
        phase, phase[..., :1].repeat(X.shape[-1], axis=-1), atol=1e-6
    )


def test_fast_iva_step_matches_class():
    from ssspy_tpu.bss.iva import FastIVA

    X = _mixture(seed=3)
    M, I = X.shape[0], X.shape[1]

    iva = FastIVA(scale_restoration=False, **_laplace_contrasts())
    iva(X.copy(), n_iter=3)
    W_cls = np.asarray(iva.demix_filter)

    # identical whitened input (transform.whiten), planar steps
    Z = np.asarray(whiten(jnp.asarray(X)))
    Zs = jnp.asarray(np.stack([Z.real, Z.imag]))
    W0 = np.tile(np.eye(M, dtype=complex), (I, 1, 1))
    Ws = jnp.asarray(np.stack([W0.real, W0.imag]))
    step = jax.jit(fast_iva_step_sc)
    for _ in range(3):
        Ws = step(Zs, Ws)
    W_sc = np.asarray(Ws[0]) + 1j * np.asarray(Ws[1])
    np.testing.assert_allclose(W_sc, W_cls, atol=1e-8)


def test_faster_iva_matches_class_after_projection_back():
    from ssspy_tpu.bss.iva import FasterIVA
    from ssspy_tpu.fast import _projection_back_host

    X = _mixture(seed=4)
    M, I = X.shape[0], X.shape[1]
    kw = _laplace_contrasts()
    kw.pop("dd_contrast_fn")

    iva = FasterIVA(**kw)
    Y_cls = np.asarray(iva(X.copy(), n_iter=3))

    Z = np.asarray(whiten(jnp.asarray(X)))
    Zs = jnp.asarray(np.stack([Z.real, Z.imag]))
    W0 = np.tile(np.eye(M, dtype=complex), (I, 1, 1))
    Ws = jnp.asarray(np.stack([W0.real, W0.imag]))
    step = jax.jit(faster_iva_step_sc)
    for _ in range(3):
        Ws = step(Zs, Ws)
    W_sc = np.asarray(Ws[0]) + 1j * np.asarray(Ws[1])
    Y_sc = np.einsum("inm,mit->nit", W_sc, Z)
    Y_sc = _projection_back_host(Y_sc, X, 0)
    np.testing.assert_allclose(Y_sc, Y_cls, atol=1e-8)


def test_fast_iva_whiten_sc_end_to_end_matches_class():
    """Full SC pipeline (whiten_sc on device) is phase-equivariant: the
    projected-back output matches the class path exactly."""
    from ssspy_tpu.bss.iva import FastIVA
    from ssspy_tpu.fast import _projection_back_host

    X = _mixture(seed=5)
    M, I = X.shape[0], X.shape[1]

    iva = FastIVA(**_laplace_contrasts())
    Y_cls = np.asarray(iva(X.copy(), n_iter=3))

    Xs = jnp.asarray(np.stack([X.real, X.imag]))
    Zs = whiten_sc(Xs)
    W0 = np.tile(np.eye(M, dtype=complex), (I, 1, 1))
    Ws = jnp.asarray(np.stack([W0.real, W0.imag]))
    for _ in range(3):
        Ws = fast_iva_step_sc(Zs, Ws)
    W_sc = np.asarray(Ws[0]) + 1j * np.asarray(Ws[1])
    Z = np.asarray(Zs[0]) + 1j * np.asarray(Zs[1])
    Y_sc = np.einsum("inm,mit->nit", W_sc, Z)
    Y_sc = _projection_back_host(Y_sc, X, 0)
    np.testing.assert_allclose(Y_sc, Y_cls, atol=1e-8)


def test_whiten_sc_isotropic_bin_stays_full_rank():
    """An exactly-isotropic bin covariance (degenerate embedded spectrum)
    must still whiten to a full-rank basis: the graded diagonal jitter
    breaks the cluster so the per-pair column extraction cannot return
    complex-parallel vectors."""
    rng = np.random.default_rng(7)
    M, I, T = 3, 5, 12
    X = rng.standard_normal((M, I, T)) + 1j * rng.standard_normal((M, I, T))
    # bin 2: frames cycle through the scaled identity basis -> cov == I
    iso = np.zeros((M, T), dtype=complex)
    for t in range(T):
        iso[t % M, t] = np.sqrt(M)
    X[:, 2, :] = iso

    Zs = whiten_sc(jnp.asarray(np.stack([X.real, X.imag]), dtype=jnp.float32))
    Z = np.asarray(Zs[0]) + 1j * np.asarray(Zs[1])
    cov = np.einsum("mit,nit->imn", Z, Z.conj()) / T
    np.testing.assert_allclose(
        cov, np.tile(np.eye(M), (I, 1, 1)), atol=1e-3
    )
