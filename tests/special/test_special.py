import numpy as np
import pytest

from ssspy_tpu.special import add_flooring, identity, logsumexp, max_flooring, softmax, to_psd

from ..helpers import random_hermitian


def test_flooring():
    x = np.array([-1.0, 0.0, 1.0])
    assert np.allclose(np.asarray(identity(x)), x)
    assert np.allclose(np.asarray(max_flooring(x, eps=0.5)), [0.5, 0.5, 1.0])
    assert np.allclose(np.asarray(add_flooring(x, eps=0.5)), [-0.5, 0.5, 1.5])


@pytest.mark.parametrize("axis", [0, 1, -1])
def test_softmax_logsumexp(axis):
    rng = np.random.default_rng(0)
    X = rng.standard_normal((4, 5)) * 10
    s = np.asarray(softmax(X, axis=axis))
    assert np.allclose(s.sum(axis=axis), 1)
    from scipy.special import logsumexp as scipy_lse, softmax as scipy_softmax

    assert np.allclose(s, scipy_softmax(X, axis=axis))
    assert np.allclose(np.asarray(logsumexp(X, axis=axis)), scipy_lse(X, axis=axis))


@pytest.mark.parametrize("complex", [True, False])
def test_to_psd(complex):
    rng = np.random.default_rng(1)
    X = random_hermitian(rng, (6, 4, 4), complex=complex)
    Y = np.asarray(to_psd(X))
    # Hermitian with non-negative eigenvalues
    assert np.allclose(Y, np.swapaxes(Y, -2, -1).conj())
    lamb = np.linalg.eigvalsh(Y)
    assert np.all(lamb >= -1e-12)
    # PSD inputs are preserved
    P = random_hermitian(rng, (3, 4, 4), psd=True, complex=complex)
    assert np.allclose(np.asarray(to_psd(P)), P, atol=1e-8)
