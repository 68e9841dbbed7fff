"""Split-complex HVA / masking-PDS parity vs the complex class path."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ssspy_tpu.ops.splitc import harmonic_mask_sc, hva_pds_step_sc, prox_neg_logdet_sc


def test_prox_neg_logdet_sc_matches_complex():
    from ssspy_tpu.linalg.prox import neg_logdet

    rng = np.random.default_rng(0)
    G = rng.standard_normal((11, 4, 4)) + 1j * rng.standard_normal((11, 4, 4))
    got_r, got_i = prox_neg_logdet_sc(
        jnp.asarray(G.real), jnp.asarray(G.imag), step_size=0.7
    )
    ref = np.asarray(neg_logdet(jnp.asarray(G), step_size=0.7))
    np.testing.assert_allclose(np.asarray(got_r) + 1j * np.asarray(got_i), ref, atol=1e-8)


def test_harmonic_mask_sc_matches_class_mask():
    from ssspy_tpu.bss.hva import MaskingPDSHVA, _make_harmonic_mask_fn

    rng = np.random.default_rng(1)
    N, I, T = 3, 17, 12
    Z = rng.standard_normal((N, I, T)) + 1j * rng.standard_normal((N, I, T))

    hva = MaskingPDSHVA(mask_iter=2, attenuation=0.4)
    mask_ref = np.asarray(_make_harmonic_mask_fn(hva)(jnp.asarray(Z)))
    mask_sc = np.asarray(
        harmonic_mask_sc(jnp.asarray(Z.real), jnp.asarray(Z.imag), 0.4, mask_iter=2)
    )
    np.testing.assert_allclose(mask_sc, mask_ref, atol=1e-8)


def test_hva_pds_step_matches_class():
    from ssspy_tpu.bss.hva import MaskingPDSHVA

    rng = np.random.default_rng(2)
    M, I, T = 3, 17, 20
    X = rng.standard_normal((M, I, T)) + 1j * rng.standard_normal((M, I, T))

    hva = MaskingPDSHVA(mask_iter=1, scale_restoration=False)
    hva(X.copy(), n_iter=3)
    W_cls = np.asarray(hva.demix_filter)

    Xs = jnp.asarray(np.stack([X.real, X.imag]))
    W0 = np.tile(np.eye(M, dtype=complex), (I, 1, 1))
    Ws = jnp.asarray(np.stack([W0.real, W0.imag]))
    Ys = jnp.zeros((2, M, I, T), dtype=Xs.dtype)
    step = jax.jit(hva_pds_step_sc)
    for _ in range(3):
        Ws, Ys = step(Xs, Ws, Ys)

    W_sc = np.asarray(Ws[0]) + 1j * np.asarray(Ws[1])
    np.testing.assert_allclose(W_sc, W_cls, atol=1e-8)


def test_fast_hva_matches_class_api():
    from ssspy_tpu.bss.hva import HVA
    from ssspy_tpu.fast import fast_hva
    from ssspy_tpu.transform import stft
    from ssspy_tpu.utils.dataset import download_sample_speech_data

    images, _ = download_sample_speech_data(
        cache_dir="/tmp/ssspy_tpu_test_data",
        n_sources=2,
        max_duration=0.5,
        conv=True,
        seed=0,
    )
    X = np.asarray(stft(images.sum(axis=0), n_fft=256, hop_length=128))

    Y_fast, W = fast_hva(X, n_iter=5)
    hva = HVA()
    Y_cls = np.asarray(hva(X.astype(np.complex64).copy(), n_iter=5))
    np.testing.assert_allclose(Y_fast, Y_cls, atol=5e-3)


def test_hva_pds_step_relaxation_matches_class():
    """Non-default relaxation exercises the blend branch the
    relaxation=1 specialization skips."""
    from ssspy_tpu.bss.hva import MaskingPDSHVA

    rng = np.random.default_rng(5)
    M, I, T = 3, 17, 20
    X = rng.standard_normal((M, I, T)) + 1j * rng.standard_normal((M, I, T))

    hva = MaskingPDSHVA(
        mask_iter=1, relaxation=0.5, scale_restoration=False, record_loss=False
    )
    hva(X.copy(), n_iter=3)
    W_cls = np.asarray(hva.demix_filter)

    Xs = jnp.asarray(np.stack([X.real, X.imag]))
    W0 = np.tile(np.eye(M, dtype=complex), (I, 1, 1))
    Ws = jnp.asarray(np.stack([W0.real, W0.imag]))
    Ys = jnp.zeros((2, M, I, T), dtype=Xs.dtype)
    step = jax.jit(functools.partial(hva_pds_step_sc, relaxation=0.5))
    for _ in range(3):
        Ws, Ys = step(Xs, Ws, Ys)

    W_sc = np.asarray(Ws[0]) + 1j * np.asarray(Ws[1])
    np.testing.assert_allclose(W_sc, W_cls, atol=1e-8)
