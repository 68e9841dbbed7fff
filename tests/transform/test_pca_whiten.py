import numpy as np
import pytest

from ssspy_tpu.transform import pca, whiten

from ..helpers import requires_reference


def _rand(shape, complex, seed=0):
    rng = np.random.default_rng(seed)
    if complex:
        return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    return rng.standard_normal(shape)


@pytest.mark.parametrize(
    "shape,complex",
    [((2, 64), False), ((2, 17, 32), True), ((3, 2, 64), False), ((3, 2, 17, 32), True)],
)
def test_whiten_identity_covariance(shape, complex):
    X = _rand(shape, complex)
    Y = np.asarray(whiten(X))
    assert Y.shape == X.shape
    ch_axis = 0 if (X.ndim == 2 or (X.ndim == 3 and complex)) else 1
    Ym = np.moveaxis(Y, ch_axis, -1)
    cov = np.einsum("...tm,...tn->...mn", Ym, Ym.conj()) / Ym.shape[-2]
    m = cov.shape[-1]
    assert np.allclose(cov, np.broadcast_to(np.eye(m), cov.shape), atol=1e-8)


@pytest.mark.parametrize(
    "shape,complex",
    [((2, 64), False), ((2, 17, 32), True), ((3, 2, 64), False), ((3, 2, 17, 32), True)],
)
def test_pca_diagonal_covariance(shape, complex):
    X = _rand(shape, complex, seed=1)
    Y = np.asarray(pca(X))
    assert Y.shape == X.shape
    ch_axis = 0 if (X.ndim == 2 or (X.ndim == 3 and complex)) else 1
    Ym = np.moveaxis(Y, ch_axis, -1)
    cov = np.einsum("...tm,...tn->...mn", Ym, Ym.conj()) / Ym.shape[-2]
    off = cov - np.eye(cov.shape[-1]) * np.diagonal(cov, axis1=-2, axis2=-1)[..., None, :] * np.eye(cov.shape[-1])
    off = cov * (1 - np.eye(cov.shape[-1]))
    assert np.allclose(off, 0, atol=1e-8)
    # dominant component first
    d = np.real(np.diagonal(cov, axis1=-2, axis2=-1))
    assert np.all(np.diff(d, axis=-1) <= 1e-8)


@requires_reference
@pytest.mark.parametrize(
    "shape,complex",
    [((2, 64), False), ((2, 17, 32), True), ((3, 2, 17, 32), True)],
)
def test_matches_reference(shape, complex):
    from ssspy.transform import pca as pca_ref, whiten as whiten_ref

    X = _rand(shape, complex, seed=2)
    assert np.allclose(np.asarray(whiten(X)), whiten_ref(X), atol=1e-8)
    assert np.allclose(np.asarray(pca(X)), pca_ref(X), atol=1e-8)
