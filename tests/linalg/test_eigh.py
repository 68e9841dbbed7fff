import numpy as np
import pytest

from ssspy_tpu.linalg import eigh, eigh2, inv2

from ..helpers import random_hermitian

parametrize_batch = pytest.mark.parametrize("batch", [(), (8,), (4, 5)])
parametrize_complex = pytest.mark.parametrize("complex", [True, False])
parametrize_type = pytest.mark.parametrize("type", [1, 2, 3])


@parametrize_batch
@parametrize_complex
@pytest.mark.parametrize("m", [2, 3, 4, 6])
def test_eigh_standard(batch, complex, m):
    rng = np.random.default_rng(0)
    A = random_hermitian(rng, batch + (m, m), complex=complex)
    lamb, Z = eigh(A)
    lamb, Z = np.asarray(lamb), np.asarray(Z)
    assert np.allclose(A @ Z, lamb[..., None, :] * Z, atol=1e-8)
    # orthonormal columns
    ZHZ = np.swapaxes(Z, -2, -1).conj() @ Z
    assert np.allclose(ZHZ, np.eye(m), atol=1e-8)


@parametrize_batch
@parametrize_complex
@parametrize_type
@pytest.mark.parametrize("m", [2, 3, 4])
def test_eigh_generalized(batch, complex, type, m):
    rng = np.random.default_rng(1)
    A = random_hermitian(rng, batch + (m, m), complex=complex)
    B = random_hermitian(rng, batch + (m, m), psd=True, complex=complex)
    lamb, Z = eigh(A, B, type=type)
    lamb, Z = np.asarray(lamb), np.asarray(Z)
    if type == 1:
        assert np.allclose(A @ Z, lamb[..., None, :] * (B @ Z), atol=1e-8)
    elif type == 2:
        assert np.allclose(A @ B @ Z, lamb[..., None, :] * Z, atol=1e-8)
    else:
        assert np.allclose(B @ A @ Z, lamb[..., None, :] * Z, atol=1e-8)


@parametrize_batch
@parametrize_complex
def test_eigh2_standard(batch, complex):
    rng = np.random.default_rng(2)
    A = random_hermitian(rng, batch + (2, 2), complex=complex)
    lamb, Z = eigh2(A)
    lamb, Z = np.asarray(lamb), np.asarray(Z)
    assert np.allclose(A @ Z, lamb[..., None, :] * Z, atol=1e-8)
    ZHZ = np.swapaxes(Z, -2, -1).conj() @ Z
    assert np.allclose(ZHZ, np.eye(2), atol=1e-8)
    # ascending eigenvalues, matching numpy's convention
    lamb_np = np.linalg.eigvalsh(A)
    assert np.allclose(lamb, lamb_np, atol=1e-8)


def test_eigh2_degenerate():
    # scalar multiples of the identity (radius = 0) must not NaN
    A = np.stack([2.0 * np.eye(2), -3.0 * np.eye(2)]).astype(complex)
    lamb, Z = eigh2(A)
    lamb, Z = np.asarray(lamb), np.asarray(Z)
    assert np.all(np.isfinite(lamb)) and np.all(np.isfinite(Z))
    assert np.allclose(A @ Z, lamb[..., None, :] * Z, atol=1e-12)


def test_eigh2_diagonal():
    A = np.array([[[3.0, 0.0], [0.0, 1.0]], [[1.0, 0.0], [0.0, 5.0]]]).astype(complex)
    lamb, Z = eigh2(A)
    lamb, Z = np.asarray(lamb), np.asarray(Z)
    assert np.allclose(np.sort(lamb, axis=-1), lamb)
    assert np.allclose(A @ Z, lamb[..., None, :] * Z, atol=1e-12)


@parametrize_batch
@parametrize_complex
@parametrize_type
def test_eigh2_generalized(batch, complex, type):
    rng = np.random.default_rng(3)
    A = random_hermitian(rng, batch + (2, 2), complex=complex)
    B = random_hermitian(rng, batch + (2, 2), psd=True, complex=complex)
    lamb, Z = eigh2(A, B, type=type)
    lamb, Z = np.asarray(lamb), np.asarray(Z)
    if type == 1:
        assert np.allclose(A @ Z, lamb[..., None, :] * (B @ Z), atol=1e-8)
    elif type == 2:
        assert np.allclose(A @ B @ Z, lamb[..., None, :] * Z, atol=1e-8)
    else:
        assert np.allclose(B @ A @ Z, lamb[..., None, :] * Z, atol=1e-8)


@parametrize_batch
@parametrize_complex
def test_inv2(batch, complex):
    rng = np.random.default_rng(4)
    if complex:
        X = rng.standard_normal(batch + (2, 2)) + 1j * rng.standard_normal(batch + (2, 2))
    else:
        X = rng.standard_normal(batch + (2, 2))
    X_inv = np.asarray(inv2(X))
    assert np.allclose(X @ X_inv, np.broadcast_to(np.eye(2), X.shape), atol=1e-8)
    assert np.allclose(X_inv @ X, np.broadcast_to(np.eye(2), X.shape), atol=1e-8)
