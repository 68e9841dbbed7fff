import numpy as np
import pytest

from ssspy_tpu.algorithm import minimal_distortion_principle, projection_back

from ..helpers import requires_reference


def _mix(seed=0, n=2, bins=17, frames=32):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, bins, frames)) + 1j * rng.standard_normal((n, bins, frames))
    W = rng.standard_normal((bins, n, n)) + 1j * rng.standard_normal((bins, n, n))
    Y = (W @ X.transpose(1, 0, 2)).transpose(1, 0, 2)
    return X, W, Y


def test_projection_back_filter_mode():
    X, W, _ = _mix()
    W_scaled = np.asarray(projection_back(W, reference_id=0))
    assert W_scaled.shape == W.shape
    # rescaled demix satisfies sum_n (W^{-1})[ref, n] * W[n] rows scaling:
    # separated-with-scaled filter equals per-source images at the ref mic
    Y = (W_scaled @ X.transpose(1, 0, 2)).transpose(1, 0, 2)
    # scale-restored signals sum to the mixture at the reference channel
    assert np.allclose(Y.sum(axis=0), X[0], atol=1e-8)


def test_projection_back_data_mode():
    X, _, Y = _mix(seed=1)
    Y_scaled = np.asarray(projection_back(Y, reference=X, reference_id=0))
    assert Y_scaled.shape == Y.shape
    # least-squares reconstruction of the reference channel
    assert np.allclose(Y_scaled.sum(axis=0), X[0], atol=1e-7)


def test_minimal_distortion_principle():
    X, _, Y = _mix(seed=2)
    Y_scaled = np.asarray(minimal_distortion_principle(Y, reference=X, reference_id=0))
    assert Y_scaled.shape == Y.shape
    # MDP scaling leaves residual orthogonal to each separated signal
    z_num = np.sum(Y * X[0].conj(), axis=-1, keepdims=True)
    z_den = np.sum(np.abs(Y) ** 2, axis=-1, keepdims=True)
    assert np.allclose(Y_scaled, (z_num / z_den).conj() * Y, atol=1e-10)


@requires_reference
def test_matches_reference():
    from ssspy.algorithm import (
        minimal_distortion_principle as mdp_ref,
        projection_back as pb_ref,
    )

    X, W, Y = _mix(seed=3)
    assert np.allclose(
        np.asarray(projection_back(W, reference_id=0)), pb_ref(W, reference_id=0), atol=1e-9
    )
    assert np.allclose(
        np.asarray(projection_back(Y, reference=X, reference_id=0)),
        pb_ref(Y, reference=X, reference_id=0),
        atol=1e-9,
    )
    assert np.allclose(
        np.asarray(minimal_distortion_principle(Y, reference=X, reference_id=0)),
        mdp_ref(Y, reference=X, reference_id=0),
        atol=1e-9,
    )
    # reference_id=None paths
    assert np.allclose(
        np.asarray(projection_back(W, reference_id=None)),
        pb_ref(W, reference_id=None),
        atol=1e-9,
    )
