"""Pallas kernel parity (interpreter mode on CPU) + step integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssspy_tpu.ops.pallas_kernels import weighted_covariance_sc
from ssspy_tpu.ops.splitc import auxiva_ip1_step_sc


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


def test_step_with_interpret_covariance_matches_einsum():
    rng = np.random.default_rng(1)
    M, I, T = 3, 16, 40
    Xs = jnp.asarray(rng.standard_normal((2, M, I, T)), jnp.float32)
    Ws = jnp.zeros((2, I, M, M), jnp.float32).at[0].set(jnp.eye(M))

    W_e = auxiva_ip1_step_sc(Xs, Ws, covariance_impl="einsum")
    W_p = auxiva_ip1_step_sc(Xs, Ws, covariance_impl="interpret")
    np.testing.assert_allclose(np.asarray(W_e), np.asarray(W_p), atol=1e-4)
