"""MNMF tests: smoke + parity vs the NumPy reference."""

import numpy as np
import pytest

from ssspy_tpu.bss.mnmf import FastGaussMNMF, GaussMNMF
from ssspy_tpu.transform import stft

from ..helpers import requires_reference

N_BASIS = 2


def _mixture(n_sources=2, n_samples=2048, seed=0):
    from ssspy_tpu.utils.dataset import download_sample_speech_data

    images, _ = download_sample_speech_data(
        cache_dir="/tmp/ssspy_tpu_test_data",
        n_sources=n_sources,
        max_duration=n_samples / 16000,
        conv=True,
        seed=seed,
    )
    mix = images.sum(axis=0)
    return np.asarray(stft(mix, n_fft=128, hop_length=64))


def test_gauss_mnmf_smoke():
    X = _mixture()
    mnmf = GaussMNMF(n_basis=N_BASIS, rng=np.random.default_rng(0))
    Y = np.asarray(mnmf(X, n_iter=3))
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))
    assert len(mnmf.loss) == 4
    assert all(isinstance(v, float) for v in mnmf.loss)
    assert mnmf.loss[-1] <= mnmf.loss[0] + 1e-4


def test_gauss_mnmf_partitioning():
    X = _mixture()
    mnmf = GaussMNMF(n_basis=N_BASIS, partitioning=True, rng=np.random.default_rng(0))
    Y = np.asarray(mnmf(X, n_iter=3))
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))


def test_gauss_mnmf_underdetermined():
    """n_sources > n_channels via full covariance model + Wiener filter."""
    X = _mixture(n_sources=2)
    mnmf = GaussMNMF(n_basis=N_BASIS, n_sources=3, rng=np.random.default_rng(0))
    Y = np.asarray(mnmf(X, n_iter=2))
    assert Y.shape == (3, X.shape[1], X.shape[2])
    assert np.all(np.isfinite(Y))


@pytest.mark.parametrize("diagonalizer", ["IP", "IP2"])
def test_fast_gauss_mnmf_smoke(diagonalizer):
    X = _mixture()
    mnmf = FastGaussMNMF(
        n_basis=N_BASIS,
        diagonalizer_algorithm=diagonalizer,
        rng=np.random.default_rng(0),
    )
    Y = np.asarray(mnmf(X, n_iter=3))
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))
    assert len(mnmf.loss) == 4
    assert mnmf.loss[-1] <= mnmf.loss[0] + 1e-4


def test_mnmf_repr():
    assert "GaussMNMF" in repr(GaussMNMF(n_basis=2))
    assert "FastGaussMNMF" in repr(FastGaussMNMF(n_basis=2))
    with pytest.raises(AssertionError):
        FastGaussMNMF(n_basis=2, partitioning=True)
    with pytest.raises(AssertionError):
        FastGaussMNMF(n_basis=2, diagonalizer_algorithm="bogus")


# ---------------- parity vs the NumPy reference ----------------


def _nmf_init(n_sources, n_bins, n_frames, seed, partitioning=False):
    rng = np.random.default_rng(seed)
    if partitioning:
        Z = rng.random((n_sources, N_BASIS))
        return {
            "basis": rng.random((n_bins, N_BASIS)),
            "activation": rng.random((N_BASIS, n_frames)),
            "latent": Z / Z.sum(axis=0),
        }
    return {
        "basis": rng.random((n_sources, n_bins, N_BASIS)),
        "activation": rng.random((n_sources, N_BASIS, n_frames)),
    }


@requires_reference
@pytest.mark.parametrize("partitioning", [False, True])
def test_gauss_mnmf_matches_reference(partitioning):
    import ssspy.bss.mnmf as ref_mnmf

    X = _mixture(seed=1)
    init = _nmf_init(2, X.shape[1], X.shape[2], seed=5, partitioning=partitioning)

    ours = GaussMNMF(n_basis=N_BASIS, partitioning=partitioning)
    theirs = ref_mnmf.GaussMNMF(n_basis=N_BASIS, partitioning=partitioning)
    Y_ours = np.asarray(ours(X.copy(), n_iter=3, **{k: v.copy() for k, v in init.items()}))
    Y_theirs = theirs(X.copy(), n_iter=3, **{k: v.copy() for k, v in init.items()})

    assert np.allclose(ours.loss, theirs.loss, atol=1e-4), (
        np.max(np.abs(np.array(ours.loss) - np.array(theirs.loss)))
    )
    assert np.allclose(Y_ours, Y_theirs, atol=1e-4), np.abs(Y_ours - Y_theirs).max()


@requires_reference
@pytest.mark.parametrize("diagonalizer", ["IP", "IP2"])
def test_fast_gauss_mnmf_matches_reference(diagonalizer):
    import ssspy.bss.mnmf as ref_mnmf

    X = _mixture(seed=2)

    # spatial D is drawn after basis/activation from the same rng stream, so
    # pass identically-seeded generators instead of explicit arrays.
    ours = FastGaussMNMF(
        n_basis=N_BASIS,
        diagonalizer_algorithm=diagonalizer,
        rng=np.random.default_rng(7),
    )
    theirs = ref_mnmf.FastGaussMNMF(
        n_basis=N_BASIS,
        diagonalizer_algorithm=diagonalizer,
        rng=np.random.default_rng(7),
    )
    Y_ours = np.asarray(ours(X.copy(), n_iter=4))
    Y_theirs = theirs(X.copy(), n_iter=4)

    assert np.allclose(ours.loss, theirs.loss, atol=1e-4), (
        np.max(np.abs(np.array(ours.loss) - np.array(theirs.loss)))
    )
    assert np.allclose(Y_ours, Y_theirs, atol=1e-4), np.abs(Y_ours - Y_theirs).max()
