"""PDSIVA/ADMMIVA split-complex kernel parity (x64)."""

import jax
import jax.numpy as jnp
import numpy as np

from ssspy_tpu.ops.splitc import admm_iva_step_sc, pds_iva_step_sc, prox_l21_sc


def _mixture(seed=0, M=3, I=9, T=24):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((M, I, T)) + 1j * rng.standard_normal((M, I, T))


def test_prox_l21_sc_matches_complex():
    from ssspy_tpu.linalg import prox

    rng = np.random.default_rng(1)
    Z = rng.standard_normal((3, 9, 24)) + 1j * rng.standard_normal((3, 9, 24))
    Pr, Pi = prox_l21_sc(jnp.asarray(Z.real), jnp.asarray(Z.imag), step_size=0.7)
    P_ref = np.asarray(prox.l21(jnp.asarray(Z), step_size=0.7, axis2=1))
    np.testing.assert_allclose(np.asarray(Pr) + 1j * np.asarray(Pi), P_ref, atol=1e-12)


def test_pds_iva_step_matches_class():
    from ssspy_tpu.bss.iva import PDSIVA

    X = _mixture(seed=2)
    M, I, T = X.shape

    pds = PDSIVA(mu1=0.8, mu2=1.2, scale_restoration=False, record_loss=False)
    pds(X.copy(), n_iter=3)
    W_cls = np.asarray(pds.demix_filter)
    dual_cls = np.asarray(pds.dual)[0]  # single penalty

    Xs = jnp.asarray(np.stack([X.real, X.imag]))
    W0 = np.tile(np.eye(M, dtype=complex), (I, 1, 1))
    Ws = jnp.asarray(np.stack([W0.real, W0.imag]))
    Ys = jnp.zeros((2, M, I, T))
    step = jax.jit(lambda W, Y: pds_iva_step_sc(Xs, W, Y, mu1=0.8, mu2=1.2))
    for _ in range(3):
        Ws, Ys = step(Ws, Ys)

    np.testing.assert_allclose(
        np.asarray(Ws[0]) + 1j * np.asarray(Ws[1]), W_cls, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(Ys[0]) + 1j * np.asarray(Ys[1]), dual_cls, atol=1e-8
    )


def test_pds_iva_step_relaxation_matches_class():
    from ssspy_tpu.bss.iva import PDSIVA

    X = _mixture(seed=3)
    M, I, T = X.shape

    pds = PDSIVA(relaxation=0.5, scale_restoration=False, record_loss=False)
    pds(X.copy(), n_iter=3)
    W_cls = np.asarray(pds.demix_filter)

    Xs = jnp.asarray(np.stack([X.real, X.imag]))
    W0 = np.tile(np.eye(M, dtype=complex), (I, 1, 1))
    Ws = jnp.asarray(np.stack([W0.real, W0.imag]))
    Ys = jnp.zeros((2, M, I, T))
    for _ in range(3):
        Ws, Ys = pds_iva_step_sc(Xs, Ws, Ys, relaxation=0.5)

    np.testing.assert_allclose(
        np.asarray(Ws[0]) + 1j * np.asarray(Ws[1]), W_cls, atol=1e-8
    )


def test_admm_iva_step_matches_class():
    from ssspy_tpu.bss.iva import ADMMIVA

    X = _mixture(seed=4)
    M, I, T = X.shape

    admm = ADMMIVA(rho=1.3, scale_restoration=False, record_loss=False)
    admm(X.copy(), n_iter=3)
    W_cls = np.asarray(admm.demix_filter)

    Xs = jnp.asarray(np.stack([X.real, X.imag]))
    zf = jnp.zeros((2, I, M, M))
    zs = jnp.zeros((2, M, I, T))
    V, Vt, Y, Yt = zf, zs, zf, zs
    step = jax.jit(lambda V, Vt, Y, Yt: admm_iva_step_sc(Xs, V, Vt, Y, Yt, rho=1.3))
    for _ in range(3):
        Ws, V, Vt, Y, Yt = step(V, Vt, Y, Yt)

    np.testing.assert_allclose(
        np.asarray(Ws[0]) + 1j * np.asarray(Ws[1]), W_cls, atol=1e-8
    )


def test_prox_neg_logdet_lift_null_exact_on_singular_matrices():
    """Every null direction of a rank-deficient G must be lifted to exactly
    sqrt(step) (the prox minimizer's singular value at sigma=0), for both
    the zero matrix and structurally singular nonzero matrices."""
    from ssspy_tpu.ops.splitc import prox_neg_logdet_sc

    rng = np.random.default_rng(5)
    step = 0.7

    # zero matrix: LAPACK convention sqrt(step) I
    Z = jnp.zeros((3, 4, 4))
    Pr, Pi = prox_neg_logdet_sc(Z, Z, step_size=step, lift_null=True)
    np.testing.assert_allclose(
        np.asarray(Pr), np.sqrt(step) * np.tile(np.eye(4), (3, 1, 1)), atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(Pi), 0.0, atol=1e-12)

    # rank-1-deficient complex G: singular values of the prox must be
    # f(sigma) for the big directions and exactly sqrt(step) for the null one
    a = rng.standard_normal((5, 4, 3)) + 1j * rng.standard_normal((5, 4, 3))
    b = rng.standard_normal((5, 3, 4)) + 1j * rng.standard_normal((5, 3, 4))
    G = a @ b  # rank 3 of 4
    Pr, Pi = prox_neg_logdet_sc(
        jnp.asarray(G.real), jnp.asarray(G.imag), step_size=step, lift_null=True
    )
    P = np.asarray(Pr) + 1j * np.asarray(Pi)
    s_g = np.linalg.svd(G, compute_uv=False)
    s_p = np.sort(np.linalg.svd(P, compute_uv=False), axis=-1)
    f = (s_g + np.sqrt(s_g**2 + 4 * step)) / 2
    want = np.sort(np.concatenate([f[:, :3], np.full((5, 1), np.sqrt(step))], axis=1), axis=-1)
    np.testing.assert_allclose(s_p, want, atol=1e-8)
