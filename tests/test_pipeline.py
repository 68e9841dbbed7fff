"""End-to-end pipeline + redundant-alias equivalence tests."""

import jax.numpy as jnp
import numpy as np
import pytest

import ssspy_tpu
from ssspy_tpu.bss.iva import AuxIVA, AuxLaplaceIVA


def _mixture(n_sources=2, n_samples=8000, seed=0):
    from ssspy_tpu.utils.dataset import download_sample_speech_data

    images, _ = download_sample_speech_data(
        cache_dir="/tmp/ssspy_tpu_test_data",
        n_sources=n_sources,
        max_duration=n_samples / 16000,
        conv=True,
        seed=seed,
    )
    return images  # (n_sources, n_channels, n_samples)


def _si_sdr(est, ref):
    alpha = np.sum(est * ref) / np.sum(ref**2)
    ref = alpha * ref
    return 10 * np.log10(np.sum(ref**2) / np.sum((est - ref) ** 2))


def test_separate_end_to_end_improves_si_sdr():
    # longer mixture: separation statistics need enough frames per bin
    images = _mixture(n_samples=32000)
    mix = images.sum(axis=0)

    y = np.asarray(
        ssspy_tpu.separate(
            mix, AuxLaplaceIVA(spatial_algorithm="IP"), n_iter=40, n_fft=256
        )
    )
    assert y.shape == mix.shape
    assert np.all(np.isfinite(y))

    # each estimate should match one source image (at the ref mic) better
    # than the raw mixture does
    refs = images[:, 0]  # (n_sources, n_samples) at reference channel
    for n in range(refs.shape[0]):
        best = max(_si_sdr(y[m], refs[n]) for m in range(y.shape[0]))
        baseline = _si_sdr(mix[0], refs[n])
        assert best > baseline + 3.0, (best, baseline)


def test_separate_forwards_warm_start():
    images = _mixture()
    mix = images.sum(axis=0)
    iva = AuxLaplaceIVA(spatial_algorithm="IP")
    _ = ssspy_tpu.separate(mix, iva, n_iter=3, n_fft=256)
    W = np.asarray(iva.demix_filter)

    iva2 = AuxLaplaceIVA(spatial_algorithm="IP")
    _ = ssspy_tpu.separate(
        mix, iva2, n_iter=1, n_fft=256, demix_filter=W.copy(), initial_call=False
    )
    assert len(iva2.loss) == 1


@pytest.mark.parametrize("alias,canonical", [("IP", "IP1"), ("ISS", "ISS1")])
def test_spatial_algorithm_aliases(alias, canonical):
    """IP is an alias of IP1 and ISS of ISS1 (reference redundant-alias
    tier, gated behind --run-redundant upstream)."""
    from ssspy_tpu.transform import stft

    images = _mixture()
    X = np.asarray(stft(images.sum(axis=0), n_fft=256, hop_length=128))

    def run(algo):
        iva = AuxIVA(
            spatial_algorithm=algo,
            contrast_fn=lambda y: 2 * jnp.linalg.norm(y, axis=1),
            d_contrast_fn=lambda y: 2 * jnp.ones_like(y),
        )
        return np.asarray(iva(X.copy(), n_iter=4)), list(iva.loss)

    Y_a, loss_a = run(alias)
    Y_c, loss_c = run(canonical)
    np.testing.assert_allclose(Y_a, Y_c, atol=1e-8)
    np.testing.assert_allclose(loss_a, loss_c, atol=1e-8)
