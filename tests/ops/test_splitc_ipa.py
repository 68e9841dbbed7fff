"""Split-complex IPA machinery parity vs the complex class path."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ssspy_tpu.ops.splitc import (
    auxiva_ipa_step_sc,
    gauss_ilrma_ipa_step_sc,
    ipa_sweep_sc,
    lqpqm2_sc,
    psd_inv_sc,
    to_psd_sc,
)


def _random_hermitian_psd(rng, shape, dim):
    A = rng.standard_normal(shape + (dim, dim)) + 1j * rng.standard_normal(
        shape + (dim, dim)
    )
    return A @ np.conj(np.swapaxes(A, -1, -2)) / dim


def test_to_psd_sc_matches_complex():
    from ssspy_tpu.special.psd import to_psd

    rng = np.random.default_rng(0)
    A = rng.standard_normal((11, 4, 4)) + 1j * rng.standard_normal((11, 4, 4))
    # non-Hermitian input: exercises the hermitize path too
    got_r, got_i = to_psd_sc(jnp.asarray(A.real), jnp.asarray(A.imag))
    ref = np.asarray(to_psd(jnp.asarray(A)))
    np.testing.assert_allclose(np.asarray(got_r) + 1j * np.asarray(got_i), ref, atol=1e-10)


def test_psd_inv_sc_matches_complex():
    from ssspy_tpu.bss._update_spatial_model import _psd_inv

    rng = np.random.default_rng(1)
    A = _random_hermitian_psd(rng, (7,), 5)
    got_r, got_i = psd_inv_sc(jnp.asarray(A.real), jnp.asarray(A.imag))
    ref = np.asarray(_psd_inv(jnp.asarray(A)))
    np.testing.assert_allclose(np.asarray(got_r) + 1j * np.asarray(got_i), ref, atol=1e-8)


def test_lqpqm2_sc_matches_complex():
    from ssspy_tpu.linalg.lqpqm import lqpqm2

    rng = np.random.default_rng(2)
    n_bins, K = 64, 3
    H = _random_hermitian_psd(rng, (n_bins,), K) + 0.1 * np.eye(K)
    v = rng.standard_normal((n_bins, K)) + 1j * rng.standard_normal((n_bins, K))
    z = np.abs(rng.standard_normal(n_bins)) + 0.1

    for max_iter in (1, 10):
        got_r, got_i = lqpqm2_sc(
            jnp.asarray(H.real),
            jnp.asarray(H.imag),
            jnp.asarray(v.real),
            jnp.asarray(v.imag),
            jnp.asarray(z),
            max_iter=max_iter,
        )
        ref = np.asarray(lqpqm2(jnp.asarray(H), jnp.asarray(v), jnp.asarray(z), max_iter=max_iter))
        np.testing.assert_allclose(
            np.asarray(got_r) + 1j * np.asarray(got_i), ref, atol=1e-8
        )


def test_ipa_sweep_sc_matches_update_by_ipa():
    from ssspy_tpu.bss._update_spatial_model import update_by_ipa

    rng = np.random.default_rng(3)
    N, I, T = 3, 9, 24
    Y = rng.standard_normal((N, I, T)) + 1j * rng.standard_normal((N, I, T))
    varphi = np.abs(rng.standard_normal((N, I, T))) + 0.1

    got_r, got_i = ipa_sweep_sc(
        jnp.asarray(Y.real), jnp.asarray(Y.imag), jnp.asarray(varphi)
    )
    ref = np.asarray(update_by_ipa(jnp.asarray(Y), jnp.asarray(varphi), max_iter=1))
    np.testing.assert_allclose(np.asarray(got_r) + 1j * np.asarray(got_i), ref, atol=1e-8)


def test_auxiva_ipa_step_matches_class():
    from ssspy_tpu.bss.iva import AuxIVA

    rng = np.random.default_rng(4)
    N, I, T = 3, 9, 30
    Y0 = rng.standard_normal((N, I, T)) + 1j * rng.standard_normal((N, I, T))

    iva = AuxIVA(
        spatial_algorithm="IPA",
        contrast_fn=lambda y: 2 * jnp.linalg.norm(y, axis=1),
        d_contrast_fn=lambda y: 2 * jnp.ones_like(y),
        scale_restoration=False,
    )
    Y_cls = np.asarray(iva(Y0.copy(), n_iter=3))

    Ys = jnp.asarray(np.stack([Y0.real, Y0.imag]))
    step = jax.jit(auxiva_ipa_step_sc)
    for _ in range(3):
        Ys = step(Ys)
    Y_sc = np.asarray(Ys[0]) + 1j * np.asarray(Ys[1])
    np.testing.assert_allclose(Y_sc, Y_cls, atol=1e-8)


def test_gauss_ilrma_ipa_step_matches_class():
    from ssspy_tpu.bss.ilrma import GaussILRMA

    rng = np.random.default_rng(5)
    M, I, T_frames, K = 3, 9, 20, 3
    X = rng.standard_normal((M, I, T_frames)) + 1j * rng.standard_normal(
        (M, I, T_frames)
    )
    T0 = rng.random((M, I, K)) + 0.1
    V0 = rng.random((M, K, T_frames)) + 0.1

    ilrma = GaussILRMA(n_basis=K, spatial_algorithm="IPA", scale_restoration=False)
    Y_cls = np.asarray(ilrma(X.copy(), n_iter=3, basis=T0.copy(), activation=V0.copy()))

    Ys = jnp.asarray(np.stack([X.real, X.imag]))
    Tb, Vb = jnp.asarray(T0), jnp.asarray(V0)
    step = jax.jit(functools.partial(gauss_ilrma_ipa_step_sc, eps=1e-10))
    for _ in range(3):
        Ys, Tb, Vb = step(Ys, Tb, Vb)

    Y_sc = np.asarray(Ys[0]) + 1j * np.asarray(Ys[1])
    np.testing.assert_allclose(Y_sc, Y_cls, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Tb), np.asarray(ilrma.basis), atol=1e-8)


def test_ipa_tikhonov_psd_impl_quality_and_robustness():
    """The eigh-free tikhonov PSD path reaches the same separation quality
    as the reference-exact eigh path in f32, and survives near-silent bins."""
    import functools

    import jax

    from ssspy_tpu.fast import _projection_back_host
    from ssspy_tpu.ops.splitc import auxiva_ipa_step_sc
    from ssspy_tpu.transform import istft, stft
    from ssspy_tpu.utils.dataset import download_sample_speech_data
    from tests.helpers import si_sdr

    images, _ = download_sample_speech_data(
        cache_dir="/tmp/ssspy_tpu_test_data", n_sources=2, max_duration=1.0,
        conv=True, seed=3,
    )
    mix = images.sum(axis=0)
    X = np.asarray(stft(mix, n_fft=256, hop_length=128))
    Xs = jnp.asarray(np.stack([X.real, X.imag]), dtype=jnp.float32)

    def run(impl, n_iter=30):
        step = jax.jit(functools.partial(auxiva_ipa_step_sc, psd_impl=impl))
        Ys = Xs
        for _ in range(n_iter):
            Ys = step(Ys)
        Y = np.asarray(Ys[0]) + 1j * np.asarray(Ys[1])
        Y = _projection_back_host(Y, X, 0)
        return np.asarray(istft(Y, n_fft=256, hop_length=128, length=mix.shape[-1]))

    def quality(y):
        import itertools

        best = -np.inf
        for perm in itertools.permutations(range(2)):
            best = max(
                best,
                np.mean([si_sdr(y[perm[s]], images[s, 0]) for s in range(2)]),
            )
        return best

    y_t, y_e = run("tikhonov"), run("eigh")
    assert np.all(np.isfinite(y_t))
    q_t, q_e = quality(y_t), quality(y_e)
    assert q_t > q_e - 0.2, (q_t, q_e)

    # near-silent bin: the ridge keeps the planar solves bounded
    X_bad = X.copy()
    X_bad[:, 9] *= 1e-6
    Xs_bad = jnp.asarray(np.stack([X_bad.real, X_bad.imag]), dtype=jnp.float32)
    step = jax.jit(functools.partial(auxiva_ipa_step_sc, psd_impl="tikhonov"))
    Ys = Xs_bad
    for _ in range(30):
        Ys = step(Ys)
    assert np.all(np.isfinite(np.asarray(Ys)))
