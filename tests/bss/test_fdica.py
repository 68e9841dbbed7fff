"""FDICA tests: smoke matrix + parity vs the NumPy reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from ssspy_tpu.bss.fdica import (
    AuxFDICA,
    AuxLaplaceFDICA,
    GradFDICA,
    GradLaplaceFDICA,
    NaturalGradFDICA,
    NaturalGradLaplaceFDICA,
)
from ssspy_tpu.transform import stft

from ..helpers import requires_reference


def _mixture(n_sources=2, n_samples=4096, seed=0):
    from ssspy_tpu.utils.dataset import download_sample_speech_data

    images, _ = download_sample_speech_data(
        cache_dir="/tmp/ssspy_tpu_test_data",
        n_sources=n_sources,
        max_duration=n_samples / 16000,
        conv=True,
        seed=seed,
    )
    mix = images.sum(axis=0)
    return np.asarray(stft(mix, n_fft=256, hop_length=128))


def contrast_fn(y):
    return 2 * jnp.abs(y)


def d_contrast_fn(y):
    return 2 * jnp.ones_like(y)


def score_fn(y):
    return y / jnp.maximum(jnp.abs(y), 1e-10).astype(y.dtype)


@pytest.mark.parametrize("spatial", ["IP", "IP1", "IP2"])
def test_aux_fdica_smoke(spatial):
    X = _mixture()
    fdica = AuxFDICA(
        spatial_algorithm=spatial, contrast_fn=contrast_fn, d_contrast_fn=d_contrast_fn
    )
    Y = np.asarray(fdica(X, n_iter=3))
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))
    assert len(fdica.loss) == 4
    assert all(isinstance(v, float) for v in fdica.loss)
    assert fdica.loss[-1] <= fdica.loss[0] + 1e-6


@pytest.mark.parametrize("cls", [GradFDICA, NaturalGradFDICA])
def test_grad_fdica_smoke(cls):
    X = _mixture()
    fdica = cls(step_size=0.01, contrast_fn=contrast_fn, score_fn=score_fn)
    Y = np.asarray(fdica(X, n_iter=3))
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))


@pytest.mark.parametrize(
    "cls", [GradLaplaceFDICA, NaturalGradLaplaceFDICA, AuxLaplaceFDICA]
)
def test_fixed_prior_fdica_smoke(cls):
    X = _mixture()
    fdica = cls() if cls is AuxLaplaceFDICA else cls(step_size=0.01)
    Y = np.asarray(fdica(X, n_iter=3))
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))


def test_fdica_no_permutation_alignment():
    X = _mixture()
    fdica = AuxLaplaceFDICA(permutation_alignment=False, scale_restoration="MDP")
    Y = np.asarray(fdica(X, n_iter=2))
    assert Y.shape == X.shape


def test_fdica_repr():
    fdica = AuxLaplaceFDICA(spatial_algorithm="IP2")
    assert "AuxLaplaceFDICA" in repr(fdica) and "spatial_algorithm=IP2" in repr(fdica)


# ---------------- parity vs the NumPy reference ----------------


@requires_reference
@pytest.mark.parametrize("spatial", ["IP", "IP2"])
def test_aux_fdica_matches_reference(spatial):
    import ssspy.bss.fdica as ref_fdica

    X = _mixture(seed=1)
    ours = AuxLaplaceFDICA(spatial_algorithm=spatial)
    theirs = ref_fdica.AuxLaplaceFDICA(spatial_algorithm=spatial)
    Y_ours = np.asarray(ours(X.copy(), n_iter=5))
    Y_theirs = theirs(X.copy(), n_iter=5)

    assert np.allclose(ours.loss, theirs.loss, atol=1e-6)
    assert np.allclose(Y_ours, Y_theirs, atol=1e-6), np.abs(Y_ours - Y_theirs).max()


@requires_reference
@pytest.mark.parametrize("holonomic", [True, False])
def test_grad_fdica_matches_reference(holonomic):
    import ssspy.bss.fdica as ref_fdica

    X = _mixture(seed=2)
    ours = GradLaplaceFDICA(step_size=0.05, is_holonomic=holonomic)
    theirs = ref_fdica.GradLaplaceFDICA(step_size=0.05, is_holonomic=holonomic)
    Y_ours = np.asarray(ours(X.copy(), n_iter=5))
    Y_theirs = theirs(X.copy(), n_iter=5)

    assert np.allclose(ours.loss, theirs.loss, atol=1e-6)
    assert np.allclose(Y_ours, Y_theirs, atol=1e-6)


@requires_reference
def test_natural_grad_fdica_matches_reference():
    import ssspy.bss.fdica as ref_fdica

    X = _mixture(seed=3)
    ours = NaturalGradLaplaceFDICA(step_size=0.05)
    theirs = ref_fdica.NaturalGradLaplaceFDICA(step_size=0.05)
    Y_ours = np.asarray(ours(X.copy(), n_iter=5))
    Y_theirs = theirs(X.copy(), n_iter=5)

    assert np.allclose(ours.loss, theirs.loss, atol=1e-6)
    assert np.allclose(Y_ours, Y_theirs, atol=1e-6)
