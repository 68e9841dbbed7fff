"""Checkpoint/resume: interrupted runs match uninterrupted ones."""

import jax.numpy as jnp
import numpy as np

from ssspy_tpu.bss.ilrma import GaussILRMA
from ssspy_tpu.bss.iva import AuxIVA
from ssspy_tpu.transform import stft
from ssspy_tpu.utils.checkpoint import load_checkpoint, resume, save_checkpoint


def _mixture(n_sources=2, n_samples=4096, seed=0):
    from ssspy_tpu.utils.dataset import download_sample_speech_data

    images, _ = download_sample_speech_data(
        cache_dir="/tmp/ssspy_tpu_test_data",
        n_sources=n_sources,
        max_duration=n_samples / 16000,
        conv=True,
        seed=seed,
    )
    return np.asarray(stft(images.sum(axis=0), n_fft=256, hop_length=128))


def contrast_fn(y):
    return 2 * jnp.linalg.norm(y, axis=1)


def d_contrast_fn(y):
    return 2 * jnp.ones_like(y)


def _auxiva(algo):
    return AuxIVA(
        spatial_algorithm=algo, contrast_fn=contrast_fn, d_contrast_fn=d_contrast_fn
    )


def test_resume_matches_uninterrupted_ip(tmp_path):
    X = _mixture()

    full = _auxiva("IP")
    Y_full = np.asarray(full(X.copy(), n_iter=6))

    half = _auxiva("IP")
    half(X.copy(), n_iter=3)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, half)

    cont = _auxiva("IP")
    Y_cont = np.asarray(resume(cont, X.copy(), path, n_iter=3))

    np.testing.assert_allclose(Y_cont, Y_full, atol=1e-5)
    assert len(cont.loss) == len(full.loss)
    np.testing.assert_allclose(cont.loss, full.loss, atol=1e-4)


def test_resume_matches_uninterrupted_iss(tmp_path):
    X = _mixture()

    full = _auxiva("ISS")
    Y_full = np.asarray(full(X.copy(), n_iter=6))

    half = _auxiva("ISS")
    half(X.copy(), n_iter=3, scale_restoration=False) if False else half(X.copy(), n_iter=3)
    # checkpoint BEFORE scale restoration would be ideal; restoration is
    # idempotent under projection back of the already-scaled output, so
    # the resumed trajectory differs: compare via a fresh run instead
    path = str(tmp_path / "ckpt.npz")

    half2 = AuxIVA(
        spatial_algorithm="ISS",
        contrast_fn=contrast_fn,
        d_contrast_fn=d_contrast_fn,
        scale_restoration=False,
    )
    half2(X.copy(), n_iter=3)
    save_checkpoint(path, half2)

    cont = AuxIVA(
        spatial_algorithm="ISS",
        contrast_fn=contrast_fn,
        d_contrast_fn=d_contrast_fn,
        scale_restoration=False,
    )
    Y_cont = np.asarray(resume(cont, X.copy(), path, n_iter=3))

    full2 = AuxIVA(
        spatial_algorithm="ISS",
        contrast_fn=contrast_fn,
        d_contrast_fn=d_contrast_fn,
        scale_restoration=False,
    )
    Y_full2 = np.asarray(full2(X.copy(), n_iter=6))
    np.testing.assert_allclose(Y_cont, Y_full2, atol=1e-5)


def test_resume_ilrma(tmp_path):
    X = _mixture()

    # fresh rng per instance: a shared Generator would be consumed by the
    # first run and give the second a different NMF init
    full = GaussILRMA(n_basis=2, spatial_algorithm="IP", rng=np.random.default_rng(0))
    Y_full = np.asarray(full(X.copy(), n_iter=4))

    half = GaussILRMA(n_basis=2, spatial_algorithm="IP", rng=np.random.default_rng(0))
    half(X.copy(), n_iter=2)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, half)

    cont = GaussILRMA(n_basis=2, spatial_algorithm="IP")
    Y_cont = np.asarray(resume(cont, X.copy(), path, n_iter=2))

    np.testing.assert_allclose(Y_cont, Y_full, atol=1e-5)


def test_checkpoint_roundtrip_keys(tmp_path):
    X = _mixture()
    ilrma = GaussILRMA(n_basis=2, rng=np.random.default_rng(0))
    ilrma(X, n_iter=1)
    path = str(tmp_path / "c.npz")
    save_checkpoint(path, ilrma)
    state = load_checkpoint(path)
    assert {"demix_filter", "basis", "activation"} <= set(state)


def test_checkpoint_excludes_input_derived_state(tmp_path):
    """Whitened/unit inputs and instant covariances are recomputed by
    _reset and must not bloat checkpoints or leak as bogus kwargs."""
    import jax.numpy as jnp

    from ssspy_tpu.bss.iva import FastIVA
    from ssspy_tpu.bss.mnmf import GaussMNMF
    from ssspy_tpu.utils.checkpoint import state_dict

    X = _mixture()
    fast = FastIVA(
        contrast_fn=lambda y: 2 * jnp.linalg.norm(y, axis=1),
        d_contrast_fn=lambda y: 2 * jnp.ones_like(y),
        dd_contrast_fn=lambda y: jnp.zeros_like(y),
    )
    fast(X.copy(), n_iter=1)
    keys = set(state_dict(fast))
    assert "latent" not in keys and "Xw" not in keys
    assert "demix_filter" in keys

    mnmf = GaussMNMF(n_basis=2, rng=np.random.default_rng(0))
    mnmf(X.copy(), n_iter=1)
    keys = set(state_dict(mnmf))
    assert "XX" not in keys
    assert {"basis", "activation", "spatial"} <= keys


def test_sc_engine_checkpoint_resume_matches_uninterrupted(tmp_path):
    """Split-complex runs checkpoint as complex host arrays: a save/resume
    through the SC engine (impl="fast") must reproduce the uninterrupted
    SC trajectory bit-for-bit (the planar [real, imag] scan state is
    converted back to complex by state_dict)."""
    from ssspy_tpu.bss.iva import AuxLaplaceIVA

    X = _mixture().astype(np.complex64)
    full = AuxLaplaceIVA(spatial_algorithm="IP1", impl="fast", record_loss=False)
    Y_full = full(X.copy(), n_iter=8)

    half = AuxLaplaceIVA(spatial_algorithm="IP1", impl="fast", record_loss=False)
    half(X.copy(), n_iter=4)
    path = str(tmp_path / "sc.npz")
    save_checkpoint(path, half)

    state = load_checkpoint(path)
    assert np.iscomplexobj(state["demix_filter"])

    rest = AuxLaplaceIVA(spatial_algorithm="IP1", impl="fast", record_loss=False)
    Y_rest = resume(rest, X.copy(), path, n_iter=4)
    np.testing.assert_array_equal(np.asarray(Y_rest), np.asarray(Y_full))


def test_sc_engine_checkpoint_demix_free(tmp_path):
    """Same contract for the demix-free (Y-state) SC families."""
    from ssspy_tpu.bss.iva import AuxLaplaceIVA

    X = _mixture().astype(np.complex64)
    full = AuxLaplaceIVA(spatial_algorithm="ISS1", impl="fast", record_loss=False)
    Y_full = full(X.copy(), n_iter=8)

    half = AuxLaplaceIVA(spatial_algorithm="ISS1", impl="fast", record_loss=False)
    half(X.copy(), n_iter=4)
    path = str(tmp_path / "sc_iss.npz")
    save_checkpoint(path, half)

    state = load_checkpoint(path)
    assert np.iscomplexobj(state["output"])

    rest = AuxLaplaceIVA(spatial_algorithm="ISS1", impl="fast", record_loss=False)
    Y_rest = resume(rest, X.copy(), path, n_iter=4)
    np.testing.assert_array_equal(np.asarray(Y_rest), np.asarray(Y_full))


def test_sc_engine_checkpoint_cacgmm(tmp_path):
    """cACGMM's SC state uses the ``Xu`` input key and a planar ``B``:
    state_dict must exclude the unit input and convert the covariance
    back to complex; resume must reproduce the uninterrupted run."""
    from ssspy_tpu.bss.cacgmm import CACGMM

    X = _mixture().astype(np.complex64)
    full = CACGMM(rng=np.random.default_rng(2), impl="fast",
                  permutation_alignment=False, record_loss=False)
    Y_full = full(X.copy(), n_iter=8)

    half = CACGMM(rng=np.random.default_rng(2), impl="fast",
                  permutation_alignment=False, record_loss=False)
    half(X.copy(), n_iter=4)
    path = str(tmp_path / "sc_cacgmm.npz")
    save_checkpoint(path, half)

    state = load_checkpoint(path)
    assert set(state) == {"mixing", "covariance"}
    assert np.iscomplexobj(state["covariance"])
    assert not np.iscomplexobj(state["mixing"])

    rest = CACGMM(rng=np.random.default_rng(99), impl="fast",
                  permutation_alignment=False, record_loss=False)
    Y_rest = resume(rest, X.copy(), path, n_iter=4)
    np.testing.assert_array_equal(np.asarray(Y_rest), np.asarray(Y_full))
