"""fast.* production separators: parity vs the class API."""

import jax.numpy as jnp
import numpy as np
import pytest

from ssspy_tpu.bss.ilrma import GaussILRMA
from ssspy_tpu.bss.iva import AuxIVA
from ssspy_tpu.fast import fast_auxiva, fast_gauss_ilrma
from ssspy_tpu.transform import stft


def _mixture(n_sources=2, n_samples=8000, seed=0):
    from ssspy_tpu.utils.dataset import download_sample_speech_data

    images, _ = download_sample_speech_data(
        cache_dir="/tmp/ssspy_tpu_test_data",
        n_sources=n_sources,
        max_duration=n_samples / 16000,
        conv=True,
        seed=seed,
    )
    return np.asarray(stft(images.sum(axis=0), n_fft=256, hop_length=128))


def _class_auxiva(X, algo, n_iter):
    iva = AuxIVA(
        spatial_algorithm=algo,
        contrast_fn=lambda y: 2 * jnp.linalg.norm(y, axis=1),
        d_contrast_fn=lambda y: 2 * jnp.ones_like(y),
    )
    return np.asarray(iva(X.astype(np.complex64).copy(), n_iter=n_iter))


@pytest.mark.parametrize("algorithm,class_algo", [("IP1", "IP"), ("ISS1", "ISS")])
def test_fast_auxiva_matches_class_api(algorithm, class_algo):
    X = _mixture()
    Y_fast, W = fast_auxiva(X, n_iter=5, algorithm=algorithm)
    Y_cls = _class_auxiva(X, class_algo, n_iter=5)

    assert Y_fast.shape == X.shape
    # f32 planar vs complex64 class path: same trajectory to fp tolerance
    np.testing.assert_allclose(Y_fast, Y_cls, atol=5e-3)
    if algorithm == "IP1":
        assert W.shape == (X.shape[1], X.shape[0], X.shape[0])


def test_fast_gauss_ilrma_matches_class_api():
    X = _mixture(seed=1)
    rng_init = np.random.default_rng(7)
    n_basis = 2
    T0 = rng_init.random((2, X.shape[1], n_basis))
    V0 = rng_init.random((2, n_basis, X.shape[2]))

    class _FixedRng:
        """Generator stub replaying the fixed NMF init."""

        def __init__(self):
            self.draws = [T0, V0]

        def random(self, shape):
            value = self.draws.pop(0)
            assert value.shape == tuple(shape)
            return value

    Y_fast, (T, V), W = fast_gauss_ilrma(X, n_basis=n_basis, n_iter=4, rng=_FixedRng())

    ilrma = GaussILRMA(n_basis=n_basis, spatial_algorithm="IP")
    Y_cls = np.asarray(
        ilrma(
            X.astype(np.complex64).copy(),
            n_iter=4,
            basis=T0.astype(np.float32),
            activation=V0.astype(np.float32),
        )
    )
    np.testing.assert_allclose(Y_fast, Y_cls, atol=5e-3)


def test_fast_auxiva_batch_on_virtual_mesh():
    """Batched fast path shards over the 8 virtual devices and matches
    per-utterance single runs."""
    X0 = _mixture(seed=2)  # 129 bins -- not divisible; crop to mesh-friendly
    X0 = X0[:, :128, :]
    X1 = _mixture(seed=3)[:, :128, :]
    batch = np.stack([X0, X1])

    from ssspy_tpu.fast import fast_auxiva_batch

    Y_b, W_b = fast_auxiva_batch(batch, n_iter=4)
    assert Y_b.shape == batch.shape
    assert np.all(np.isfinite(Y_b))

    for b, Xb in enumerate((X0, X1)):
        Y_s, W_s = fast_auxiva(Xb, n_iter=4, algorithm="IP1")
        np.testing.assert_allclose(Y_b[b], Y_s, atol=1e-4)


def test_fast_auxiva_improves_si_sdr():
    """End-to-end separation quality of the fast path on a real mixture."""
    from ssspy_tpu.utils.dataset import download_sample_speech_data

    images, _ = download_sample_speech_data(
        cache_dir="/tmp/ssspy_tpu_test_data",
        n_sources=2,
        max_duration=2.0,
        conv=True,
        seed=0,
    )
    mix = images.sum(axis=0)
    X = np.asarray(stft(mix, n_fft=256, hop_length=128))

    Y, _ = fast_auxiva(X, n_iter=40)
    from ssspy_tpu.transform import istft

    y = np.asarray(istft(Y, n_fft=256, hop_length=128, length=mix.shape[-1]))

    def si_sdr(est, ref):
        alpha = np.sum(est * ref) / np.sum(ref**2)
        ref = alpha * ref
        return 10 * np.log10(np.sum(ref**2) / np.sum((est - ref) ** 2))

    refs = images[:, 0]
    for n in range(2):
        best = max(si_sdr(y[m], refs[n]) for m in range(2))
        assert best > si_sdr(mix[0], refs[n]) + 3.0


def test_fast_auxiva_invalid_algorithm():
    X = _mixture()
    with pytest.raises(AssertionError):
        fast_auxiva(X, n_iter=1, algorithm="FOO")


def test_fast_auxiva_ip2_matches_class_api():
    X = _mixture(seed=5)
    Y_fast, W = fast_auxiva(X, n_iter=4, algorithm="IP2")
    Y_cls = _class_auxiva(X, "IP2", n_iter=4)
    np.testing.assert_allclose(Y_fast, Y_cls, atol=5e-3)


def test_fast_auxiva_iss2_matches_class_api():
    X = _mixture(seed=6)
    Y_fast, W = fast_auxiva(X, n_iter=4, algorithm="ISS2")
    Y_cls = _class_auxiva(X, "ISS2", n_iter=4)
    assert W is None
    np.testing.assert_allclose(Y_fast, Y_cls, atol=5e-3)


def test_fast_gauss_ilrma_iss1():
    X = _mixture(seed=7)
    Y, (T, V), W = fast_gauss_ilrma(
        X, n_basis=2, n_iter=5, algorithm="ISS1", rng=np.random.default_rng(0)
    )
    assert W is None
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))


def test_fast_aux_fdica_matches_class_api():
    import jax
    from ssspy_tpu.bss.fdica import AuxFDICA
    from ssspy_tpu.fast import fast_aux_fdica

    X = _mixture(seed=8)
    Y_fast, W = fast_aux_fdica(X, n_iter=5, algorithm="IP1")

    fdica = AuxFDICA(
        spatial_algorithm="IP",
        contrast_fn=lambda y: 2 * jnp.abs(y),
        d_contrast_fn=lambda y: 2 * jnp.ones_like(y),
    )
    Y_cls = np.asarray(fdica(X.astype(np.complex64).copy(), n_iter=5))
    np.testing.assert_allclose(Y_fast, Y_cls, atol=5e-3)
    assert W.shape == (X.shape[1], X.shape[0], X.shape[0])


def test_fast_aux_fdica_ip2_runs():
    from ssspy_tpu.fast import fast_aux_fdica

    X = _mixture(seed=9)
    Y, W = fast_aux_fdica(X, n_iter=4, algorithm="IP2")
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))


def test_fast_gauss_mnmf_matches_class_api():
    from ssspy_tpu.bss.mnmf import FastGaussMNMF
    from ssspy_tpu.fast import fast_gauss_mnmf

    X = _mixture(seed=10)
    n_basis = 2
    rng_init = np.random.default_rng(3)
    M, I, T_frames = X.shape
    T0 = rng_init.random((M, I, n_basis))
    V0 = rng_init.random((M, n_basis, T_frames))
    D0 = np.maximum(rng_init.random((I, M, M)), 1e-10)

    class _FixedRng:
        def __init__(self):
            self.draws = [T0, V0, D0]

        def random(self, shape):
            value = self.draws.pop(0)
            assert value.shape == tuple(shape)
            return value

    Y_fast, _ = fast_gauss_mnmf(X, n_basis=n_basis, n_iter=4, rng=_FixedRng())

    mnmf = FastGaussMNMF(
        n_basis=n_basis, diagonalizer_algorithm="IP1", partitioning=False
    )
    Y_cls = np.asarray(
        mnmf(
            X.astype(np.complex64).copy(),
            n_iter=4,
            basis=T0.astype(np.float32),
            activation=V0.astype(np.float32),
            spatial=D0.astype(np.float32),
        )
    )
    np.testing.assert_allclose(Y_fast, Y_cls, atol=5e-3)


def test_fast_auxiva_wave_matches_host_composition():
    """Single on-device program (stft_sc -> scan -> istft_sc) equals the
    host-composed stft/fast_auxiva/istft path."""
    from ssspy_tpu.fast import fast_auxiva_wave
    from ssspy_tpu.transform import istft

    from ssspy_tpu.utils.dataset import download_sample_speech_data

    images, _ = download_sample_speech_data(
        cache_dir="/tmp/ssspy_tpu_test_data",
        n_sources=2,
        max_duration=1.0,
        conv=True,
        seed=4,
    )
    mix = images.sum(axis=0).astype(np.float32)

    for algo in ("IP1", "ISS1"):
        y_wave = fast_auxiva_wave(mix, n_iter=5, algorithm=algo, n_fft=256, hop_length=128)
        X = np.asarray(stft(mix, n_fft=256, hop_length=128))
        Y, _ = fast_auxiva(X, n_iter=5, algorithm=algo)
        y_ref = np.asarray(istft(Y, n_fft=256, hop_length=128, length=mix.shape[-1]))
        assert y_wave.shape == (2, mix.shape[-1])
        np.testing.assert_allclose(y_wave, y_ref, atol=1e-4 * np.abs(y_ref).max())


def test_fast_cacgmm_matches_class_api():
    from ssspy_tpu.bss.cacgmm import CACGMM
    from ssspy_tpu.fast import fast_cacgmm

    X = _mixture(seed=11)
    rng_init = np.random.default_rng(5)
    n_sources, n_bins, _ = X.shape
    alpha0 = rng_init.random((n_sources, n_bins))
    alpha0 = alpha0 / alpha0.sum(axis=0)
    B_diag = rng_init.random((n_sources, n_bins, n_sources))
    B_diag = B_diag / B_diag.sum(axis=-1, keepdims=True)
    B0 = B_diag[:, :, :, None] * np.eye(n_sources)

    class _FixedRng:
        def __init__(self):
            self.draws = [alpha0 * alpha0.sum(axis=0), B_diag * B_diag.sum(axis=-1, keepdims=True)]

        def random(self, shape):
            value = self.draws.pop(0)
            assert value.shape == tuple(shape)
            return value

    Y_fast = fast_cacgmm(X, n_iter=5, rng=_FixedRng())

    gmm = CACGMM(permutation_alignment="amplitude_correlation")
    Y_cls = np.asarray(
        gmm(
            X.astype(np.complex64).copy(),
            n_iter=5,
            mixing=alpha0.astype(np.float32),
            covariance=B0.astype(np.complex64),
        )
    )
    assert Y_fast.shape == Y_cls.shape
    np.testing.assert_allclose(Y_fast, Y_cls, atol=5e-3)


def test_fast_cacgmm_underdetermined():
    from ssspy_tpu.fast import fast_cacgmm

    X = _mixture(seed=12)  # 2 channels
    Y = fast_cacgmm(X, n_iter=5, n_sources=3, rng=np.random.default_rng(0))
    assert Y.shape == (3,) + X.shape[1:]
    assert np.all(np.isfinite(Y))


@pytest.mark.parametrize("natural", [False, True])
def test_fast_grad_iva_matches_class_api(natural):
    from ssspy_tpu.bss.iva import GradLaplaceIVA, NaturalGradLaplaceIVA
    from ssspy_tpu.fast import fast_grad_iva

    X = _mixture(seed=11)
    Y_fast, W = fast_grad_iva(X, n_iter=5, natural=natural)

    cls = NaturalGradLaplaceIVA() if natural else GradLaplaceIVA()
    Y_cls = np.asarray(cls(X.astype(np.complex64).copy(), n_iter=5))
    np.testing.assert_allclose(Y_fast, Y_cls, atol=5e-3)
    assert W.shape == (X.shape[1], X.shape[0], X.shape[0])


@pytest.mark.parametrize("natural", [False, True])
def test_fast_grad_fdica_matches_class_api(natural):
    from ssspy_tpu.bss.fdica import GradLaplaceFDICA, NaturalGradLaplaceFDICA
    from ssspy_tpu.fast import fast_grad_fdica

    X = _mixture(seed=12)
    Y_fast, W = fast_grad_fdica(X, n_iter=5, natural=natural)

    cls = NaturalGradLaplaceFDICA() if natural else GradLaplaceFDICA()
    Y_cls = np.asarray(cls(X.astype(np.complex64).copy(), n_iter=5))
    np.testing.assert_allclose(Y_fast, Y_cls, atol=5e-3)
    assert W.shape == (X.shape[1], X.shape[0], X.shape[0])


def test_fast_grad_iva_nonholonomic_runs():
    from ssspy_tpu.fast import fast_grad_iva

    X = _mixture(seed=13)
    Y, W = fast_grad_iva(X, n_iter=4, natural=True, is_holonomic=False)
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))


def _fixed_rng(T0, V0):
    class _FixedRng:
        def __init__(self):
            self.draws = [T0, V0]

        def random(self, shape):
            value = self.draws.pop(0)
            assert value.shape == tuple(shape)
            return value

    return _FixedRng()


@pytest.mark.parametrize("algorithm", ["IP1", "ISS1"])
def test_fast_t_ilrma_matches_class_api(algorithm):
    from ssspy_tpu.bss.ilrma import TILRMA
    from ssspy_tpu.fast import fast_t_ilrma

    X = _mixture(seed=14)
    rng_init = np.random.default_rng(3)
    n_basis = 2
    T0 = rng_init.random((2, X.shape[1], n_basis))
    V0 = rng_init.random((2, n_basis, X.shape[2]))

    Y_fast, (T, V), W = fast_t_ilrma(
        X, n_basis=n_basis, dof=5, n_iter=4, algorithm=algorithm, rng=_fixed_rng(T0, V0)
    )

    cls_algo = {"IP1": "IP", "ISS1": "ISS"}[algorithm]
    ilrma = TILRMA(n_basis=n_basis, dof=5, spatial_algorithm=cls_algo)
    Y_cls = np.asarray(
        ilrma(
            X.astype(np.complex64).copy(),
            n_iter=4,
            basis=T0.astype(np.float32),
            activation=V0.astype(np.float32),
        )
    )
    np.testing.assert_allclose(Y_fast, Y_cls, atol=5e-3)


def test_fast_ggd_ilrma_matches_class_api():
    from ssspy_tpu.bss.ilrma import GGDILRMA
    from ssspy_tpu.fast import fast_ggd_ilrma

    X = _mixture(seed=15)
    rng_init = np.random.default_rng(4)
    n_basis = 2
    T0 = rng_init.random((2, X.shape[1], n_basis))
    V0 = rng_init.random((2, n_basis, X.shape[2]))

    Y_fast, (T, V), W = fast_ggd_ilrma(
        X, n_basis=n_basis, beta=1.5, n_iter=4, rng=_fixed_rng(T0, V0)
    )

    ilrma = GGDILRMA(n_basis=n_basis, beta=1.5, spatial_algorithm="IP")
    Y_cls = np.asarray(
        ilrma(
            X.astype(np.complex64).copy(),
            n_iter=4,
            basis=T0.astype(np.float32),
            activation=V0.astype(np.float32),
        )
    )
    np.testing.assert_allclose(Y_fast, Y_cls, atol=5e-3)


@pytest.mark.parametrize("variant", ["fast", "faster"])
def test_fast_fixed_point_iva_matches_class_api(variant):
    from ssspy_tpu.bss.iva import FastIVA, FasterIVA
    from ssspy_tpu.fast import fast_fast_iva, fast_faster_iva

    X = _mixture(seed=16)
    contrasts = dict(
        contrast_fn=lambda y: 2 * jnp.linalg.norm(y, axis=1),
        d_contrast_fn=lambda y: 2 * jnp.ones_like(y),
    )
    if variant == "fast":
        Y_fast = fast_fast_iva(X, n_iter=4)
        cls = FastIVA(dd_contrast_fn=lambda y: jnp.zeros_like(y), **contrasts)
    else:
        Y_fast = fast_faster_iva(X, n_iter=4)
        cls = FasterIVA(**contrasts)
    Y_cls = np.asarray(cls(X.astype(np.complex64).copy(), n_iter=4))

    assert Y_fast.shape == X.shape
    np.testing.assert_allclose(Y_fast, Y_cls, atol=5e-3)


def test_fast_pds_iva_matches_class_api():
    from ssspy_tpu.bss.iva import PDSIVA
    from ssspy_tpu.fast import fast_pds_iva

    X = _mixture(seed=17)
    Y_fast, W = fast_pds_iva(X, n_iter=5)

    pds = PDSIVA()
    Y_cls = np.asarray(pds(X.astype(np.complex64).copy(), n_iter=5))
    np.testing.assert_allclose(Y_fast, Y_cls, atol=5e-3)
    assert W.shape == (X.shape[1], X.shape[0], X.shape[0])


def test_fast_admm_iva_matches_class_api():
    from ssspy_tpu.bss.iva import ADMMIVA
    from ssspy_tpu.fast import fast_admm_iva

    X = _mixture(seed=18)
    Y_fast, W = fast_admm_iva(X, n_iter=5)

    admm = ADMMIVA()
    Y_cls = np.asarray(admm(X.astype(np.complex64).copy(), n_iter=5))
    np.testing.assert_allclose(Y_fast, Y_cls, atol=5e-3)


def test_fast_gauss_ipsdta_matches_class_api():
    from ssspy_tpu.bss.ipsdta import GaussIPSDTA
    from ssspy_tpu.fast import fast_gauss_ipsdta

    X = _mixture(seed=19)[:, :33]  # 33 bins, n_blocks=4 -> remainder part
    n_basis, n_blocks = 2, 4

    Y_fast, (T, V), W = fast_gauss_ipsdta(
        X, n_basis=n_basis, n_blocks=n_blocks, n_iter=3,
        rng=np.random.default_rng(11),
    )

    ipsdta = GaussIPSDTA(
        n_basis=n_basis, n_blocks=n_blocks, rng=np.random.default_rng(11)
    )
    Y_cls = np.asarray(ipsdta(X.astype(np.complex64).copy(), n_iter=3))
    assert Y_fast.shape == X.shape
    np.testing.assert_allclose(Y_fast, Y_cls, atol=5e-3)


def test_fast_t_ipsdta_matches_class_api():
    from ssspy_tpu.bss.ipsdta import TIPSDTA
    from ssspy_tpu.fast import fast_t_ipsdta

    X = _mixture(seed=20)[:, :32]  # 32 bins, n_blocks=4 -> even parts
    n_basis, n_blocks = 2, 4

    Y_fast, (T, V), W = fast_t_ipsdta(
        X, n_basis=n_basis, n_blocks=n_blocks, dof=5, n_iter=3,
        rng=np.random.default_rng(12),
    )

    ipsdta = TIPSDTA(
        n_basis=n_basis, n_blocks=n_blocks, dof=5, rng=np.random.default_rng(12)
    )
    Y_cls = np.asarray(ipsdta(X.astype(np.complex64).copy(), n_iter=3))
    assert Y_fast.shape == X.shape
    np.testing.assert_allclose(Y_fast, Y_cls, atol=5e-3)


def test_fast_gauss_mnmf_dense_matches_class_api():
    from ssspy_tpu.bss.mnmf import GaussMNMF
    from ssspy_tpu.fast import fast_gauss_mnmf_dense

    X = _mixture(seed=21)[:, :33]
    n_basis = 2

    Y_fast, (T, V, H) = fast_gauss_mnmf_dense(
        X, n_basis=n_basis, n_iter=3, rng=np.random.default_rng(13)
    )

    mnmf = GaussMNMF(n_basis=n_basis, rng=np.random.default_rng(13))
    Y_cls = np.asarray(mnmf(X.astype(np.complex64).copy(), n_iter=3))
    assert Y_fast.shape == X.shape
    np.testing.assert_allclose(Y_fast, Y_cls, atol=5e-3)


def test_fast_gauss_ilrma_partitioning_matches_class_api():
    from ssspy_tpu.bss.ilrma import GaussILRMA
    from ssspy_tpu.fast import fast_gauss_ilrma

    X = _mixture(seed=22)
    n_basis = 2

    Y_fast, (T, V, Z), W = fast_gauss_ilrma(
        X, n_basis=n_basis, n_iter=4, partitioning=True,
        rng=np.random.default_rng(14),
    )

    ilrma = GaussILRMA(
        n_basis=n_basis, spatial_algorithm="IP", partitioning=True,
        rng=np.random.default_rng(14),
    )
    Y_cls = np.asarray(ilrma(X.astype(np.complex64).copy(), n_iter=4))
    np.testing.assert_allclose(Y_fast, Y_cls, atol=5e-3)


def test_fast_gauss_ilrma_me_matches_class_api():
    from ssspy_tpu.bss.ilrma import GaussILRMA
    from ssspy_tpu.fast import fast_gauss_ilrma

    X = _mixture(seed=23)
    rng_init = np.random.default_rng(5)
    n_basis = 2
    T0 = rng_init.random((2, X.shape[1], n_basis))
    V0 = rng_init.random((2, n_basis, X.shape[2]))

    Y_fast, (T, V), W = fast_gauss_ilrma(
        X, n_basis=n_basis, n_iter=4, source_algorithm="ME", rng=_fixed_rng(T0, V0)
    )

    ilrma = GaussILRMA(n_basis=n_basis, spatial_algorithm="IP", source_algorithm="ME")
    Y_cls = np.asarray(
        ilrma(
            X.astype(np.complex64).copy(),
            n_iter=4,
            basis=T0.astype(np.float32),
            activation=V0.astype(np.float32),
        )
    )
    np.testing.assert_allclose(Y_fast, Y_cls, atol=5e-3)


@pytest.mark.parametrize("algorithm", ["IP1", "ISS1"])
def test_fast_gauss_ilrma_wave_matches_host_composition(algorithm):
    from ssspy_tpu.fast import fast_gauss_ilrma, fast_gauss_ilrma_wave
    from ssspy_tpu.transform import istft, stft
    from ssspy_tpu.utils.dataset import download_sample_speech_data

    images, _ = download_sample_speech_data(
        cache_dir="/tmp/ssspy_tpu_test_data", n_sources=2, max_duration=0.5,
        conv=True, seed=4,
    )
    mix = images.sum(axis=0).astype(np.float32)
    n_basis = 2
    rng_init = np.random.default_rng(9)
    n_fft, hop = 256, 128

    y_wave = fast_gauss_ilrma_wave(
        mix, n_basis=n_basis, n_iter=4, algorithm=algorithm, n_fft=n_fft,
        rng=np.random.default_rng(9),
    )

    X = np.asarray(stft(mix, n_fft=n_fft, hop_length=hop))
    Y, _, _ = fast_gauss_ilrma(
        X, n_basis=n_basis, n_iter=4, algorithm=algorithm,
        rng=np.random.default_rng(9),
    )
    y_host = np.asarray(istft(Y, n_fft=n_fft, hop_length=hop, length=mix.shape[-1]))
    assert y_wave.shape == y_host.shape
    np.testing.assert_allclose(y_wave, y_host, atol=5e-3)
