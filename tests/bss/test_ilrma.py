"""ILRMA tests: smoke matrix + parity vs the NumPy reference."""

import numpy as np
import pytest

from ssspy_tpu.bss.ilrma import GGDILRMA, TILRMA, GaussILRMA
from ssspy_tpu.transform import stft

from ..helpers import requires_reference

N_BASIS = 2


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


@pytest.mark.parametrize("spatial", ["IP", "IP2", "ISS", "ISS2", "IPA"])
def test_gauss_ilrma_smoke(spatial):
    X = _mixture()
    ilrma = GaussILRMA(
        n_basis=N_BASIS, spatial_algorithm=spatial, rng=np.random.default_rng(0)
    )
    Y = np.asarray(ilrma(X, n_iter=3))
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))
    assert len(ilrma.loss) == 4
    assert all(isinstance(v, float) for v in ilrma.loss)
    assert ilrma.loss[-1] <= ilrma.loss[0] + 1e-4


@pytest.mark.parametrize("source_algorithm", ["MM", "ME"])
@pytest.mark.parametrize("partitioning", [False, True])
def test_gauss_ilrma_source_partitioning(source_algorithm, partitioning):
    X = _mixture()
    ilrma = GaussILRMA(
        n_basis=N_BASIS,
        spatial_algorithm="IP",
        source_algorithm=source_algorithm,
        partitioning=partitioning,
        rng=np.random.default_rng(0),
    )
    Y = np.asarray(ilrma(X, n_iter=3))
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))


def test_gauss_ilrma_domain_projection_back_normalization():
    X = _mixture()
    ilrma = GaussILRMA(
        n_basis=N_BASIS,
        spatial_algorithm="IP",
        domain=1,
        normalization="projection_back",
        rng=np.random.default_rng(0),
    )
    Y = np.asarray(ilrma(X, n_iter=3))
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))


@pytest.mark.parametrize("spatial", ["IP", "ISS"])
@pytest.mark.parametrize("source_algorithm", ["MM", "ME"])
def test_t_ilrma_smoke(spatial, source_algorithm):
    X = _mixture()
    ilrma = TILRMA(
        n_basis=N_BASIS,
        dof=1000,
        spatial_algorithm=spatial,
        source_algorithm=source_algorithm,
        rng=np.random.default_rng(0),
    )
    Y = np.asarray(ilrma(X, n_iter=3))
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))


@pytest.mark.parametrize("spatial", ["IP", "ISS"])
def test_ggd_ilrma_smoke(spatial):
    X = _mixture()
    ilrma = GGDILRMA(
        n_basis=N_BASIS,
        beta=1.5,
        spatial_algorithm=spatial,
        rng=np.random.default_rng(0),
    )
    Y = np.asarray(ilrma(X, n_iter=3))
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))


def test_ilrma_warm_start():
    X = _mixture()
    rng = np.random.default_rng(0)
    n_sources, n_bins, n_frames = 2, X.shape[1], X.shape[2]
    T0 = rng.random((n_sources, n_bins, N_BASIS))
    V0 = rng.random((n_sources, N_BASIS, n_frames))

    ilrma = GaussILRMA(n_basis=N_BASIS, spatial_algorithm="IP")
    _ = ilrma(X, n_iter=2, basis=T0.copy(), activation=V0.copy())
    assert np.asarray(ilrma.basis).shape == T0.shape


def test_ilrma_repr():
    assert "GaussILRMA" in repr(GaussILRMA(n_basis=2))
    assert "TILRMA" in repr(TILRMA(n_basis=2, dof=10))
    assert "GGDILRMA" in repr(GGDILRMA(n_basis=2, beta=1.2))


def test_ilrma_invalid_args():
    with pytest.raises(AssertionError):
        GaussILRMA(n_basis=2, spatial_algorithm="bogus")
    with pytest.raises(AssertionError):
        GaussILRMA(n_basis=2, source_algorithm="ME", domain=1)
    with pytest.raises(ValueError):
        TILRMA(n_basis=2, dof=10, spatial_algorithm="IPA")
    with pytest.raises(ValueError):
        GGDILRMA(n_basis=2, beta=1.5, spatial_algorithm="IPA")
    with pytest.raises(AssertionError):
        GGDILRMA(n_basis=2, beta=2.5)


# ---------------- parity vs the NumPy reference ----------------


def _nmf_init(shape_T, shape_V, seed, shape_Z=None):
    rng = np.random.default_rng(seed)
    out = {}
    if shape_Z is not None:
        Z = rng.random(shape_Z)
        out["latent"] = Z / Z.sum(axis=0)
    out["basis"] = rng.random(shape_T)
    out["activation"] = rng.random(shape_V)
    return out


@requires_reference
@pytest.mark.parametrize("spatial", ["IP", "IP2", "ISS", "ISS2", "IPA"])
def test_gauss_ilrma_matches_reference(spatial):
    import ssspy.bss.ilrma as ref_ilrma

    X = _mixture(seed=1)
    n_bins, n_frames = X.shape[1], X.shape[2]
    init = _nmf_init((2, n_bins, N_BASIS), (2, N_BASIS, n_frames), seed=5)

    ours = GaussILRMA(n_basis=N_BASIS, spatial_algorithm=spatial)
    theirs = ref_ilrma.GaussILRMA(n_basis=N_BASIS, spatial_algorithm=spatial)
    Y_ours = np.asarray(ours(X.copy(), n_iter=5, **{k: v.copy() for k, v in init.items()}))
    Y_theirs = theirs(X.copy(), n_iter=5, **{k: v.copy() for k, v in init.items()})

    assert np.allclose(ours.loss, theirs.loss, atol=1e-5), (
        np.max(np.abs(np.array(ours.loss) - np.array(theirs.loss)))
    )
    assert np.allclose(Y_ours, Y_theirs, atol=1e-5), np.abs(Y_ours - Y_theirs).max()


@requires_reference
@pytest.mark.parametrize("source_algorithm", ["MM", "ME"])
@pytest.mark.parametrize("partitioning", [False, True])
def test_gauss_ilrma_source_matches_reference(source_algorithm, partitioning):
    import ssspy.bss.ilrma as ref_ilrma

    X = _mixture(seed=2)
    n_bins, n_frames = X.shape[1], X.shape[2]
    if partitioning:
        init = _nmf_init((n_bins, N_BASIS), (N_BASIS, n_frames), seed=6, shape_Z=(2, N_BASIS))
    else:
        init = _nmf_init((2, n_bins, N_BASIS), (2, N_BASIS, n_frames), seed=6)

    kw = dict(
        n_basis=N_BASIS,
        spatial_algorithm="IP",
        source_algorithm=source_algorithm,
        partitioning=partitioning,
    )
    ours = GaussILRMA(**kw)
    theirs = ref_ilrma.GaussILRMA(**kw)
    Y_ours = np.asarray(ours(X.copy(), n_iter=4, **{k: v.copy() for k, v in init.items()}))
    Y_theirs = theirs(X.copy(), n_iter=4, **{k: v.copy() for k, v in init.items()})

    assert np.allclose(ours.loss, theirs.loss, atol=1e-5)
    assert np.allclose(Y_ours, Y_theirs, atol=1e-5)


@requires_reference
def test_gauss_ilrma_domain1_matches_reference():
    import ssspy.bss.ilrma as ref_ilrma

    X = _mixture(seed=3)
    n_bins, n_frames = X.shape[1], X.shape[2]
    init = _nmf_init((2, n_bins, N_BASIS), (2, N_BASIS, n_frames), seed=7)

    kw = dict(n_basis=N_BASIS, spatial_algorithm="IP", domain=1.0)
    ours = GaussILRMA(**kw)
    theirs = ref_ilrma.GaussILRMA(**kw)
    Y_ours = np.asarray(ours(X.copy(), n_iter=4, **{k: v.copy() for k, v in init.items()}))
    Y_theirs = theirs(X.copy(), n_iter=4, **{k: v.copy() for k, v in init.items()})

    assert np.allclose(ours.loss, theirs.loss, atol=1e-5)
    assert np.allclose(Y_ours, Y_theirs, atol=1e-5)


@requires_reference
@pytest.mark.parametrize("source_algorithm", ["MM", "ME"])
def test_t_ilrma_matches_reference(source_algorithm):
    import ssspy.bss.ilrma as ref_ilrma

    X = _mixture(seed=4)
    n_bins, n_frames = X.shape[1], X.shape[2]
    init = _nmf_init((2, n_bins, N_BASIS), (2, N_BASIS, n_frames), seed=8)

    kw = dict(n_basis=N_BASIS, dof=100, spatial_algorithm="IP", source_algorithm=source_algorithm)
    ours = TILRMA(**kw)
    theirs = ref_ilrma.TILRMA(**kw)
    Y_ours = np.asarray(ours(X.copy(), n_iter=4, **{k: v.copy() for k, v in init.items()}))
    Y_theirs = theirs(X.copy(), n_iter=4, **{k: v.copy() for k, v in init.items()})

    assert np.allclose(ours.loss, theirs.loss, atol=1e-5)
    assert np.allclose(Y_ours, Y_theirs, atol=1e-5)


@requires_reference
def test_ggd_ilrma_matches_reference():
    import ssspy.bss.ilrma as ref_ilrma

    X = _mixture(seed=5)
    n_bins, n_frames = X.shape[1], X.shape[2]
    init = _nmf_init((2, n_bins, N_BASIS), (2, N_BASIS, n_frames), seed=9)

    kw = dict(n_basis=N_BASIS, beta=1.5, spatial_algorithm="IP")
    ours = GGDILRMA(**kw)
    theirs = ref_ilrma.GGDILRMA(**kw)
    Y_ours = np.asarray(ours(X.copy(), n_iter=4, **{k: v.copy() for k, v in init.items()}))
    Y_theirs = theirs(X.copy(), n_iter=4, **{k: v.copy() for k, v in init.items()})

    assert np.allclose(ours.loss, theirs.loss, atol=1e-5)
    assert np.allclose(Y_ours, Y_theirs, atol=1e-5)
