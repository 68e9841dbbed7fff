"""IPSDTA tests: smoke + parity vs the NumPy reference."""

import numpy as np
import pytest

from ssspy_tpu.bss.ipsdta import GaussIPSDTA, TIPSDTA
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
    return np.asarray(stft(mix, n_fft=64, hop_length=32))  # 33 bins


@pytest.mark.parametrize("n_blocks", [3, 4])  # 33 % 3 == 0, 33 % 4 == 1 (remainder path)
def test_gauss_ipsdta_smoke(n_blocks):
    X = _mixture()
    ipsdta = GaussIPSDTA(
        n_basis=N_BASIS, n_blocks=n_blocks, rng=np.random.default_rng(0)
    )
    Y = np.asarray(ipsdta(X, n_iter=3))
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))
    assert len(ipsdta.loss) == 4
    assert all(isinstance(v, float) for v in ipsdta.loss)
    assert ipsdta.loss[-1] <= ipsdta.loss[0] + 1e-4


@pytest.mark.parametrize("n_blocks", [3, 4])
def test_t_ipsdta_smoke(n_blocks):
    X = _mixture()
    ipsdta = TIPSDTA(
        n_basis=N_BASIS, n_blocks=n_blocks, dof=1000, rng=np.random.default_rng(0)
    )
    Y = np.asarray(ipsdta(X, n_iter=3))
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))
    assert len(ipsdta.loss) == 4


def test_ipsdta_repr_and_validation():
    assert "GaussIPSDTA" in repr(GaussIPSDTA(n_basis=2, n_blocks=4))
    assert "TIPSDTA" in repr(TIPSDTA(n_basis=2, n_blocks=4, dof=10))

    X = _mixture()
    with pytest.raises(NotImplementedError):
        GaussIPSDTA(n_basis=2, n_blocks=4, spatial_algorithm="FPI")(X, n_iter=1)

    # The EM source update is listed but unimplemented; it must fail loudly
    # (reference raises at update time, ssspy/bss/ipsdta.py:860-863,1374-1377)
    # rather than silently running the MM update.
    with pytest.raises(NotImplementedError, match="EM"):
        GaussIPSDTA(n_basis=2, n_blocks=4, source_algorithm="EM")(X, n_iter=1)
    with pytest.raises(NotImplementedError, match="EM"):
        TIPSDTA(n_basis=2, n_blocks=4, dof=10, source_algorithm="EM")(X, n_iter=1)
    with pytest.raises(NotImplementedError, match="FPI"):
        TIPSDTA(n_basis=2, n_blocks=4, dof=10, spatial_algorithm="FPI")(X, n_iter=1)

    # Constructor rejection messages must name the offending value.
    with pytest.raises(AssertionError, match="NOPE"):
        GaussIPSDTA(n_basis=2, n_blocks=4, source_algorithm="NOPE")
    with pytest.raises(AssertionError, match="NOPE"):
        TIPSDTA(n_basis=2, n_blocks=4, dof=10, spatial_algorithm="NOPE")


def test_ipsdta_no_source_normalization():
    X = _mixture()
    ipsdta = GaussIPSDTA(
        n_basis=N_BASIS, n_blocks=3, source_normalization=False,
        rng=np.random.default_rng(0),
    )
    Y = np.asarray(ipsdta(X, n_iter=2))
    assert Y.shape == X.shape


# ---------------- parity vs the NumPy reference ----------------


def _psdtf_init(n_sources, n_bins, n_frames, n_blocks, seed):
    """Diagonal-random PSD bases matching the reference layout."""
    rng = np.random.default_rng(seed)
    n_remains = n_bins % n_blocks
    n_neighbors = n_bins // n_blocks

    eye = np.eye(n_neighbors, dtype=np.complex128)
    rand = rng.random((n_sources, N_BASIS, n_blocks - n_remains, n_neighbors))
    T = rand[..., np.newaxis] * eye
    if n_remains > 0:
        eye = np.eye(n_neighbors + 1, dtype=np.complex128)
        rand = rng.random((n_sources, N_BASIS, n_remains, n_neighbors + 1))
        T = (T, rand[..., np.newaxis] * eye)

    V = rng.random((n_sources, N_BASIS, n_frames))
    return {"basis": T, "activation": V}


def _copy_init(init):
    T = init["basis"]
    T = tuple(t.copy() for t in T) if type(T) is tuple else T.copy()
    return {"basis": T, "activation": init["activation"].copy()}


@requires_reference
@pytest.mark.parametrize("n_blocks", [3, 4])
def test_gauss_ipsdta_matches_reference(n_blocks):
    import ssspy.bss.ipsdta as ref_ipsdta

    X = _mixture(seed=1)
    init = _psdtf_init(2, X.shape[1], X.shape[2], n_blocks, seed=5)

    ours = GaussIPSDTA(n_basis=N_BASIS, n_blocks=n_blocks)
    theirs = ref_ipsdta.GaussIPSDTA(n_basis=N_BASIS, n_blocks=n_blocks)
    Y_ours = np.asarray(ours(X.copy(), n_iter=3, **_copy_init(init)))
    Y_theirs = theirs(X.copy(), n_iter=3, **_copy_init(init))

    assert np.allclose(ours.loss, theirs.loss, atol=1e-4), (
        np.max(np.abs(np.array(ours.loss) - np.array(theirs.loss)))
    )
    assert np.allclose(Y_ours, Y_theirs, atol=1e-4), np.abs(Y_ours - Y_theirs).max()


@requires_reference
@pytest.mark.parametrize("n_blocks", [3, 4])
def test_t_ipsdta_matches_reference(n_blocks):
    import ssspy.bss.ipsdta as ref_ipsdta

    X = _mixture(seed=2)
    init = _psdtf_init(2, X.shape[1], X.shape[2], n_blocks, seed=6)

    ours = TIPSDTA(n_basis=N_BASIS, n_blocks=n_blocks, dof=100)
    theirs = ref_ipsdta.TIPSDTA(n_basis=N_BASIS, n_blocks=n_blocks, dof=100)
    Y_ours = np.asarray(ours(X.copy(), n_iter=3, **_copy_init(init)))
    Y_theirs = theirs(X.copy(), n_iter=3, **_copy_init(init))

    assert np.allclose(ours.loss, theirs.loss, atol=1e-4), (
        np.max(np.abs(np.array(ours.loss) - np.array(theirs.loss)))
    )
    assert np.allclose(Y_ours, Y_theirs, atol=1e-4), np.abs(Y_ours - Y_theirs).max()
