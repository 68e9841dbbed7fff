"""Time-domain ICA tests: smoke + parity vs the NumPy reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from ssspy_tpu.bss.ica import (
    FastICA,
    GradICA,
    GradLaplaceICA,
    NaturalGradICA,
    NaturalGradLaplaceICA,
)

from ..helpers import requires_reference


def _mixture(n_sources=2, n_samples=4096, seed=0):
    """Instantaneous mixture of independent Laplace sources (time domain)."""
    rng = np.random.default_rng(seed)
    sources = rng.laplace(size=(n_sources, n_samples))
    A = rng.standard_normal((n_sources, n_sources)) + np.eye(n_sources)
    return A @ sources


def contrast_fn(y):
    return jnp.abs(y)


def score_fn(y):
    return jnp.sign(y)


def d_score_fn(y):
    return 2 * (1 - jnp.tanh(y) ** 2)


def tanh_score_fn(y):
    return jnp.tanh(y)


@pytest.mark.parametrize("cls", [GradICA, NaturalGradICA])
def test_grad_ica_smoke(cls):
    X = _mixture()
    ica = cls(step_size=0.01, contrast_fn=contrast_fn, score_fn=score_fn)
    Y = np.asarray(ica(X, n_iter=5))
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))
    assert len(ica.loss) == 6
    assert all(isinstance(v, float) for v in ica.loss)


@pytest.mark.parametrize("cls", [GradLaplaceICA, NaturalGradLaplaceICA])
@pytest.mark.parametrize("holonomic", [True, False])
def test_laplace_ica_smoke(cls, holonomic):
    X = _mixture()
    ica = cls(step_size=0.01, is_holonomic=holonomic)
    Y = np.asarray(ica(X, n_iter=5))
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))


def test_fast_ica_smoke():
    X = _mixture()
    ica = FastICA(contrast_fn=contrast_fn, score_fn=tanh_score_fn, d_score_fn=d_score_fn)
    Y = np.asarray(ica(X, n_iter=10))
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))
    # demixing filter rows are orthonormal after the fixed-point sweep
    W = np.asarray(ica.demix_filter)
    np.testing.assert_allclose(W @ W.T, np.eye(W.shape[0]), atol=1e-5)


def test_ica_separates_sources():
    """NaturalGradICA on a 2x2 instantaneous mixture recovers sources."""
    rng = np.random.default_rng(7)
    s = rng.laplace(size=(2, 8000))
    A = np.array([[1.0, 0.6], [0.4, 1.0]])
    X = A @ s
    ica = NaturalGradLaplaceICA(step_size=0.1, is_holonomic=False)
    Y = np.asarray(ica(X, n_iter=200))
    # global demix matrix should be near a scaled permutation
    G = np.abs(np.asarray(ica.demix_filter) @ A)
    G = G / G.max(axis=1, keepdims=True)
    # each row has exactly one dominant entry
    assert ((G > 0.9).sum(axis=1) == 1).all()
    assert ((G < 0.3).sum(axis=1) == 1).all()
    assert ica.loss[-1] < ica.loss[0]


def test_ica_warm_start_and_callbacks():
    X = _mixture()
    seen = []
    ica = GradLaplaceICA(step_size=0.01, callbacks=lambda m: seen.append(len(m.loss)))
    _ = ica(X, n_iter=3)
    assert len(seen) == 4

    W = np.asarray(ica.demix_filter)
    ica2 = GradLaplaceICA(step_size=0.01)
    _ = ica2(X, n_iter=1, demix_filter=W.copy(), initial_call=False)
    assert len(ica2.loss) == 1


def test_ica_repr():
    assert "GradLaplaceICA" in repr(GradLaplaceICA())
    assert "NaturalGradLaplaceICA" in repr(NaturalGradLaplaceICA())
    fast = FastICA(contrast_fn=contrast_fn, score_fn=tanh_score_fn, d_score_fn=d_score_fn)
    assert "FastICA" in repr(fast)


# ---------------- parity vs the NumPy reference ----------------


@requires_reference
@pytest.mark.parametrize("holonomic", [True, False])
@pytest.mark.parametrize("natural", [True, False])
def test_grad_ica_matches_reference(holonomic, natural):
    import ssspy.bss.ica as ref_ica

    X = _mixture(seed=3)
    ours_cls = NaturalGradLaplaceICA if natural else GradLaplaceICA
    ref_cls = ref_ica.NaturalGradLaplaceICA if natural else ref_ica.GradLaplaceICA

    ours = ours_cls(step_size=0.05, is_holonomic=holonomic)
    theirs = ref_cls(step_size=0.05, is_holonomic=holonomic)
    Y_ours = np.asarray(ours(X.copy(), n_iter=10))
    Y_theirs = theirs(X.copy(), n_iter=10)

    np.testing.assert_allclose(Y_ours, Y_theirs, atol=1e-6)
    np.testing.assert_allclose(ours.loss, theirs.loss, atol=1e-6)


@requires_reference
def test_fast_ica_matches_reference():
    import ssspy.bss.ica as ref_ica

    X = _mixture(seed=4)

    ours = FastICA(contrast_fn=contrast_fn, score_fn=tanh_score_fn, d_score_fn=d_score_fn)
    theirs = ref_ica.FastICA(
        contrast_fn=lambda y: np.abs(y),
        score_fn=lambda y: np.tanh(y),
        d_score_fn=lambda y: 2 * (1 - np.tanh(y) ** 2),
    )
    Y_ours = np.asarray(ours(X.copy(), n_iter=10))
    Y_theirs = theirs(X.copy(), n_iter=10)

    np.testing.assert_allclose(Y_ours, Y_theirs, atol=1e-6)
    np.testing.assert_allclose(ours.loss, theirs.loss, atol=1e-6)
