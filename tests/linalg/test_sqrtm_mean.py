import numpy as np
import pytest

from ssspy_tpu.linalg import gmeanmh, invsqrtmh, sqrtmh

from ..helpers import random_hermitian

parametrize_batch = pytest.mark.parametrize("batch", [(), (6,)])
parametrize_complex = pytest.mark.parametrize("complex", [True, False])


@parametrize_batch
@parametrize_complex
@pytest.mark.parametrize("m", [2, 4])
def test_sqrtmh(batch, complex, m):
    rng = np.random.default_rng(0)
    X = random_hermitian(rng, batch + (m, m), psd=True, complex=complex)
    S = np.asarray(sqrtmh(X))
    assert np.allclose(S @ S, X, atol=1e-8)


@parametrize_batch
@parametrize_complex
@pytest.mark.parametrize("m", [2, 4])
def test_invsqrtmh(batch, complex, m):
    rng = np.random.default_rng(1)
    X = random_hermitian(rng, batch + (m, m), psd=True, complex=complex)
    S = np.asarray(invsqrtmh(X))
    assert np.allclose(S @ X @ S, np.broadcast_to(np.eye(m), X.shape), atol=1e-8)


@parametrize_batch
@parametrize_complex
@pytest.mark.parametrize("m", [2, 3])
@pytest.mark.parametrize("type", [1, 2, 3])
def test_gmeanmh(batch, complex, m, type):
    rng = np.random.default_rng(2)
    A = random_hermitian(rng, batch + (m, m), psd=True, complex=complex)
    B = random_hermitian(rng, batch + (m, m), psd=True, complex=complex)
    G = np.asarray(gmeanmh(A, B, type=type))
    # G = X # Y solves X = G Y^{-1} G, i.e. G Y^{-1} G = X
    if type == 1:
        X, Y = A, B
    elif type == 2:
        X, Y = np.linalg.inv(A), B
    else:
        X, Y = A, np.linalg.inv(B)
    assert np.allclose(G @ np.linalg.inv(Y) @ G, X, atol=1e-7)
