"""Pallas kernel parity (interpreter mode on CPU) + step integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssspy_tpu.ops.pallas_kernels import (
    planar_model_traces_sc,
    weighted_covariance_sc,
)
from ssspy_tpu.ops.splitc import auxiva_ip1_step_sc, gauss_mnmf_step_sc


@pytest.mark.parametrize("shape", [(3, 17, 50, 3), (8, 64, 128, 8)])
def test_weighted_covariance_interpret_matches_einsum(shape):
    M, I, T, N = shape
    rng = np.random.default_rng(0)
    Xr = jnp.asarray(rng.standard_normal((M, I, T)), jnp.float32)
    Xi = jnp.asarray(rng.standard_normal((M, I, T)), jnp.float32)
    phi = jnp.asarray(rng.random((N, T)), jnp.float32)

    Ur0, Ui0 = weighted_covariance_sc(Xr, Xi, phi, impl="einsum")
    Ur1, Ui1 = weighted_covariance_sc(Xr, Xi, phi, impl="interpret")
    np.testing.assert_allclose(Ur0, Ur1, atol=1e-5)
    np.testing.assert_allclose(Ui0, Ui1, atol=1e-5)
    # Hermitian structure: Ur symmetric, Ui antisymmetric
    np.testing.assert_allclose(Ur1, np.swapaxes(np.asarray(Ur1), -2, -1), atol=1e-5)
    np.testing.assert_allclose(Ui1, -np.swapaxes(np.asarray(Ui1), -2, -1), atol=1e-5)


@pytest.mark.parametrize("shape", [(3, 17, 50, 3), (8, 64, 128, 8)])
def test_weighted_covariance_per_bin_interpret_matches_einsum(shape):
    """(N, I, T) per-bin weights — the ILRMA/FDICA/MNMF shape."""
    M, I, T, N = shape
    rng = np.random.default_rng(3)
    Xr = jnp.asarray(rng.standard_normal((M, I, T)), jnp.float32)
    Xi = jnp.asarray(rng.standard_normal((M, I, T)), jnp.float32)
    phi = jnp.asarray(rng.random((N, I, T)), jnp.float32)

    Ur0, Ui0 = weighted_covariance_sc(Xr, Xi, phi, impl="einsum")
    Ur1, Ui1 = weighted_covariance_sc(Xr, Xi, phi, impl="interpret")
    np.testing.assert_allclose(Ur0, Ur1, atol=1e-5)
    np.testing.assert_allclose(Ui0, Ui1, atol=1e-5)
    np.testing.assert_allclose(Ur1, np.swapaxes(np.asarray(Ur1), -2, -1), atol=1e-5)
    np.testing.assert_allclose(Ui1, -np.swapaxes(np.asarray(Ui1), -2, -1), atol=1e-5)


def test_ilrma_step_with_interpret_covariance_matches_einsum():
    """The ILRMA IP1 step through the per-bin Pallas covariance."""
    from ssspy_tpu.ops.splitc import gauss_ilrma_ip1_step_sc

    rng = np.random.default_rng(4)
    M, I, T, K = 3, 16, 40, 2
    Xs = jnp.asarray(rng.standard_normal((2, M, I, T)), jnp.float32)
    Ws = jnp.zeros((2, I, M, M), jnp.float32).at[0].set(jnp.eye(M, dtype=jnp.float32))
    T0 = jnp.asarray(rng.random((M, I, K)) + 0.1, jnp.float32)
    V0 = jnp.asarray(rng.random((M, K, T)) + 0.1, jnp.float32)

    out_e = gauss_ilrma_ip1_step_sc(Xs, Ws, T0, V0, covariance_impl="einsum")
    out_p = gauss_ilrma_ip1_step_sc(Xs, Ws, T0, V0, covariance_impl="interpret")
    for a, b in zip(out_e, out_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_step_with_interpret_covariance_matches_einsum():
    rng = np.random.default_rng(1)
    M, I, T = 3, 16, 40
    Xs = jnp.asarray(rng.standard_normal((2, M, I, T)), jnp.float32)
    Ws = jnp.zeros((2, I, M, M), jnp.float32).at[0].set(jnp.eye(M, dtype=jnp.float32))

    W_e = auxiva_ip1_step_sc(Xs, Ws, covariance_impl="einsum")
    W_p = auxiva_ip1_step_sc(Xs, Ws, covariance_impl="interpret")
    np.testing.assert_allclose(np.asarray(W_e), np.asarray(W_p), atol=1e-4)


def _mnmf_operands(seed=2, N=3, I=5, Tf=37, m=4):
    """Random PSD spatial covariances + instant covariances (planar)."""
    rng = np.random.default_rng(seed)

    def psd_batch(*batch):
        A = rng.standard_normal((*batch, m, m)) + 1j * rng.standard_normal(
            (*batch, m, m)
        )
        P = A @ np.conj(np.swapaxes(A, -1, -2)) / m + 0.1 * np.eye(m)
        return P.astype(np.complex64)

    H = psd_batch(N, I)
    XX = psd_batch(I, Tf)
    Lamb = (rng.random((N, I, Tf)) + 0.05).astype(np.float32)
    to_planar = lambda C: (jnp.asarray(C.real), jnp.asarray(C.imag))
    return (jnp.asarray(Lamb), *to_planar(H), *to_planar(XX))


@pytest.mark.parametrize("shape", [(3, 5, 37, 4), (2, 4, 130, 8)])
def test_model_traces_interpret_matches_gj(shape):
    N, I, Tf, m = shape
    ops = _mnmf_operands(N=N, I=I, Tf=Tf, m=m)
    ref = planar_model_traces_sc(*ops, eps=1e-6, impl="gj")
    out = planar_model_traces_sc(*ops, eps=1e-6, impl="interpret")
    # relative tolerance: the trace contractions reorder f32 summation
    for r, o, name in zip(ref, out, ["t1", "t2", "Pr", "Pi", "Qr", "Qi"]):
        scale = np.max(np.abs(np.asarray(r))) + 1e-30
        np.testing.assert_allclose(
            np.asarray(o) / scale, np.asarray(r) / scale, atol=2e-4, err_msg=name
        )


def test_model_traces_padded_frames_neutral():
    # Tf = 37 pads to 128 lanes: padded frames must be exactly neutral
    ops37 = _mnmf_operands(N=2, I=3, Tf=37, m=4)
    out = planar_model_traces_sc(*ops37, eps=1e-6, impl="interpret")
    ref = planar_model_traces_sc(*ops37, eps=1e-6, impl="gj")
    np.testing.assert_allclose(
        np.asarray(out[2]), np.asarray(ref[2]), rtol=0, atol=2e-4 * float(np.max(np.abs(ref[2])))
    )


def test_mnmf_step_fused_matches_unfused():
    Lamb, Hr, Hi, XXr, XXi = _mnmf_operands(N=3, I=5, Tf=37, m=3)
    N, I, Tf = Lamb.shape
    K = 2
    rng = np.random.default_rng(7)
    T0 = jnp.asarray((rng.random((N, I, K)) + 0.1).astype(np.float32))
    V0 = jnp.asarray((rng.random((N, K, Tf)) + 0.1).astype(np.float32))
    XXs = jnp.stack([XXr, XXi])
    Hs = jnp.stack([Hr, Hi])

    kw = dict(eps=1e-6, psd_impl="ridge", gmean_impl="chol")
    T_a, V_a, H_a = gauss_mnmf_step_sc(XXs, T0, V0, Hs, fuse="off", **kw)
    T_b, V_b, H_b = gauss_mnmf_step_sc(XXs, T0, V0, Hs, fuse="interpret", **kw)
    np.testing.assert_allclose(np.asarray(T_b), np.asarray(T_a), rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(V_b), np.asarray(V_a), rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(H_b), np.asarray(H_a), rtol=2e-3, atol=1e-5)
