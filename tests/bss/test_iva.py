"""End-to-end IVA tests: smoke matrix + parity vs the NumPy reference."""

import numpy as np
import pytest

from ssspy_tpu.bss.iva import (
    AuxGaussIVA,
    AuxIVA,
    AuxLaplaceIVA,
    FasterIVA,
    FastIVA,
    GradGaussIVA,
    GradIVA,
    GradLaplaceIVA,
    NaturalGradGaussIVA,
    NaturalGradIVA,
    NaturalGradLaplaceIVA,
)
from ssspy_tpu.transform import stft

from ..helpers import requires_reference


def _mixture(n_sources=3, n_samples=4096, seed=0):
    """Deterministic convolutive mixture -> STFT (M, I, T)."""
    from ssspy_tpu.utils.dataset import download_sample_speech_data

    images, _ = download_sample_speech_data(
        cache_dir="/tmp/ssspy_tpu_test_data",
        n_sources=n_sources,
        max_duration=n_samples / 16000,
        conv=True,
        seed=seed,
    )
    mix = images.sum(axis=0)  # (n_channels, n_samples)
    return np.asarray(stft(mix, n_fft=256, hop_length=128))


import jax.numpy as jnp


def contrast_fn(y):
    return 2 * jnp.linalg.norm(y, axis=1)


def d_contrast_fn(y):
    return 2 * jnp.ones_like(y)


def dd_contrast_fn(y):
    return 2 * jnp.zeros_like(y)


def score_fn(y):
    norm = jnp.maximum(jnp.linalg.norm(y, axis=1, keepdims=True), 1e-10)
    return y / norm.astype(y.dtype)


@pytest.mark.parametrize("spatial", ["IP", "IP2", "ISS", "ISS2", "IPA"])
def test_auxiva_smoke(spatial):
    X = _mixture()
    iva = AuxIVA(spatial_algorithm=spatial, contrast_fn=contrast_fn, d_contrast_fn=d_contrast_fn)
    Y = np.asarray(iva(X, n_iter=3))
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))
    assert len(iva.loss) == 4
    assert all(isinstance(v, float) for v in iva.loss)
    # MM-type updates decrease the loss monotonically (tolerance for fp)
    assert iva.loss[-1] <= iva.loss[0] + 1e-6


@pytest.mark.parametrize(
    "cls", [GradIVA, NaturalGradIVA]
)
def test_grad_iva_smoke(cls):
    X = _mixture(n_sources=2)
    iva = cls(step_size=0.01, contrast_fn=contrast_fn, score_fn=score_fn)
    Y = np.asarray(iva(X, n_iter=5))
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))
    assert len(iva.loss) == 6


@pytest.mark.parametrize(
    "cls",
    [GradLaplaceIVA, NaturalGradLaplaceIVA, GradGaussIVA, NaturalGradGaussIVA],
)
def test_fixed_prior_grad_iva_smoke(cls):
    X = _mixture(n_sources=2)
    iva = cls(step_size=0.01)
    Y = np.asarray(iva(X, n_iter=3))
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))


def test_fast_iva_smoke():
    X = _mixture(n_sources=2)
    iva = FastIVA(
        contrast_fn=contrast_fn,
        d_contrast_fn=d_contrast_fn,
        dd_contrast_fn=dd_contrast_fn,
    )
    Y = np.asarray(iva(X, n_iter=3))
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))


def test_faster_iva_smoke():
    X = _mixture(n_sources=2)
    iva = FasterIVA(contrast_fn=contrast_fn, d_contrast_fn=d_contrast_fn)
    Y = np.asarray(iva(X, n_iter=3))
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))


@pytest.mark.parametrize("spatial", ["IP", "ISS"])
def test_aux_laplace_gauss_smoke(spatial):
    X = _mixture(n_sources=2)
    for cls in (AuxLaplaceIVA, AuxGaussIVA):
        iva = cls(spatial_algorithm=spatial)
        Y = np.asarray(iva(X, n_iter=3))
        assert Y.shape == X.shape
        assert np.all(np.isfinite(Y))


def test_auxiva_warm_start():
    X = _mixture(n_sources=2)
    iva = AuxIVA(spatial_algorithm="IP", contrast_fn=contrast_fn, d_contrast_fn=d_contrast_fn)
    _ = iva(X, n_iter=2)
    W = np.asarray(iva.demix_filter)
    iva2 = AuxIVA(spatial_algorithm="IP", contrast_fn=contrast_fn, d_contrast_fn=d_contrast_fn)
    _ = iva2(X, n_iter=1, demix_filter=W.copy(), initial_call=False)
    assert len(iva2.loss) == 1


def test_auxiva_callbacks():
    X = _mixture(n_sources=2)
    seen = []

    def cb(method):
        seen.append(np.asarray(method.output).copy())

    iva = AuxIVA(
        spatial_algorithm="IP",
        contrast_fn=contrast_fn,
        d_contrast_fn=d_contrast_fn,
        callbacks=cb,
    )
    _ = iva(X, n_iter=3)
    assert len(seen) == 4  # initial + 3 iterations


def test_auxiva_repr():
    iva = AuxIVA(spatial_algorithm="IP", contrast_fn=contrast_fn, d_contrast_fn=d_contrast_fn)
    assert "AuxIVA" in repr(iva) and "spatial_algorithm=IP" in repr(iva)


# ---------------- parity vs the NumPy reference ----------------


def _run_pair(ours_cls, ref_cls, X, n_iter, our_kwargs=None, ref_kwargs=None):
    import numpy as _np

    ours = ours_cls(**(our_kwargs or {}))
    theirs = ref_cls(**(ref_kwargs or {}))
    Y_ours = _np.asarray(ours(X.copy(), n_iter=n_iter))
    Y_theirs = theirs(X.copy(), n_iter=n_iter)
    return ours, theirs, Y_ours, Y_theirs


@requires_reference
@pytest.mark.parametrize("spatial", ["IP", "IP2", "ISS", "ISS2", "IPA"])
def test_auxiva_matches_reference(spatial):
    import ssspy.bss.iva as ref_iva

    X = _mixture(n_sources=2, seed=1)

    def ref_contrast(y):
        return 2 * np.linalg.norm(y, axis=1)

    def ref_d_contrast(y):
        return 2 * np.ones_like(y)

    ours, theirs, Y_ours, Y_theirs = _run_pair(
        AuxIVA,
        ref_iva.AuxIVA,
        X,
        n_iter=5,
        our_kwargs=dict(
            spatial_algorithm=spatial, contrast_fn=contrast_fn, d_contrast_fn=d_contrast_fn
        ),
        ref_kwargs=dict(
            spatial_algorithm=spatial, contrast_fn=ref_contrast, d_contrast_fn=ref_d_contrast
        ),
    )
    # scale restoration (PB) cancels eigenvector-phase gauge freedom
    assert np.allclose(Y_ours, Y_theirs, atol=1e-6), np.abs(Y_ours - Y_theirs).max()
    assert np.allclose(ours.loss, theirs.loss, atol=1e-6)


@requires_reference
@pytest.mark.parametrize("holonomic", [True, False])
def test_grad_iva_matches_reference(holonomic):
    import ssspy.bss.iva as ref_iva

    X = _mixture(n_sources=2, seed=2)
    ours, theirs, Y_ours, Y_theirs = _run_pair(
        GradLaplaceIVA,
        ref_iva.GradLaplaceIVA,
        X,
        n_iter=5,
        our_kwargs=dict(step_size=0.05, is_holonomic=holonomic),
        ref_kwargs=dict(step_size=0.05, is_holonomic=holonomic),
    )
    assert np.allclose(Y_ours, Y_theirs, atol=1e-6)
    assert np.allclose(ours.loss, theirs.loss, atol=1e-6)


@requires_reference
def test_natural_grad_iva_matches_reference():
    import ssspy.bss.iva as ref_iva

    X = _mixture(n_sources=2, seed=3)
    ours, theirs, Y_ours, Y_theirs = _run_pair(
        NaturalGradLaplaceIVA,
        ref_iva.NaturalGradLaplaceIVA,
        X,
        n_iter=5,
        our_kwargs=dict(step_size=0.05),
        ref_kwargs=dict(step_size=0.05),
    )
    assert np.allclose(Y_ours, Y_theirs, atol=1e-6)
    assert np.allclose(ours.loss, theirs.loss, atol=1e-6)


@requires_reference
def test_aux_gauss_iva_matches_reference():
    import ssspy.bss.iva as ref_iva

    X = _mixture(n_sources=2, seed=4)
    ours, theirs, Y_ours, Y_theirs = _run_pair(
        AuxGaussIVA,
        ref_iva.AuxGaussIVA,
        X,
        n_iter=5,
        our_kwargs=dict(spatial_algorithm="IP"),
        ref_kwargs=dict(spatial_algorithm="IP"),
    )
    assert np.allclose(Y_ours, Y_theirs, atol=1e-6)
    assert np.allclose(ours.loss, theirs.loss, atol=1e-6)


@requires_reference
def test_faster_iva_matches_reference():
    import ssspy.bss.iva as ref_iva

    X = _mixture(n_sources=2, seed=5)

    def ref_contrast(y):
        return 2 * np.linalg.norm(y, axis=1)

    def ref_d_contrast(y):
        return 2 * np.ones_like(y)

    ours, theirs, Y_ours, Y_theirs = _run_pair(
        FasterIVA,
        ref_iva.FasterIVA,
        X,
        n_iter=3,
        our_kwargs=dict(contrast_fn=contrast_fn, d_contrast_fn=d_contrast_fn),
        ref_kwargs=dict(contrast_fn=ref_contrast, d_contrast_fn=ref_d_contrast),
    )
    # eigen-phase gauge may differ; compare magnitudes + loss
    assert np.allclose(np.abs(Y_ours), np.abs(Y_theirs), atol=1e-6)
    assert np.allclose(ours.loss, theirs.loss, atol=1e-6)


def test_auxiva_iss_instance_reuse():
    """A demix-free (ISS) instance can separate a second mixture.

    The reference crashes on the second call (its _reset keeps
    demix_filter=None and then matmuls None); here _reset re-initializes
    unless None was explicitly passed as a warm-start kwarg.
    """
    X = _mixture(n_sources=2)
    iva = AuxIVA(spatial_algorithm="ISS", contrast_fn=contrast_fn, d_contrast_fn=d_contrast_fn)
    Y1 = np.asarray(iva(X, n_iter=2))
    Y2 = np.asarray(iva(X, n_iter=2))
    np.testing.assert_allclose(Y1, Y2, atol=1e-6)


def test_step_size_annealing_invalidates_compiled_step():
    """Mutating a scalar hyperparameter between calls takes effect (the
    reference re-reads attributes every update_once; our compiled step
    closures must be invalidated on change)."""
    X = _mixture(n_sources=2)
    iva = GradLaplaceIVA(step_size=0.1, scale_restoration=False)
    _ = iva(X, n_iter=2)
    W1 = np.asarray(iva.demix_filter)

    iva.step_size = 1e-6  # anneal: second run should barely move W
    _ = iva(X, n_iter=2)
    W2 = np.asarray(iva.demix_filter)
    assert np.abs(W2 - W1).max() < 1e-4  # annealed steps are tiny

    iva.step_size = 0.1  # restore: moves again
    _ = iva(X, n_iter=2)
    W3 = np.asarray(iva.demix_filter)
    assert np.abs(W3 - W2).max() > 1e-3


def test_auxiva_combination_pair_selector():
    from ssspy_tpu.utils.select_pair import combination_pair_selector

    X = _mixture(n_sources=2)
    for spatial in ("IP2", "ISS2"):
        iva = AuxIVA(
            spatial_algorithm=spatial,
            contrast_fn=contrast_fn,
            d_contrast_fn=d_contrast_fn,
            pair_selector=combination_pair_selector,
        )
        Y = np.asarray(iva(X, n_iter=2))
        assert Y.shape == X.shape and np.all(np.isfinite(Y))
