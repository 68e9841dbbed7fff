import numpy as np
import pytest
import scipy.signal as ss

from ssspy_tpu.transform import istft, stft


@pytest.mark.parametrize("n_samples", [8000, 8001, 8192])
@pytest.mark.parametrize("n_fft,hop", [(512, 256), (256, 128), (512, 128)])
def test_stft_matches_scipy(n_samples, n_fft, hop):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n_samples)
    _, _, want = ss.stft(
        x, window="hann", nperseg=n_fft, noverlap=n_fft - hop, nfft=n_fft
    )
    got = np.asarray(stft(x, n_fft=n_fft, hop_length=hop))
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-10)


def test_stft_batched_channels():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 8000))
    got = np.asarray(stft(x, n_fft=512, hop_length=256))
    for ch in range(3):
        single = np.asarray(stft(x[ch], n_fft=512, hop_length=256))
        assert np.allclose(got[ch], single)


@pytest.mark.parametrize("n_samples", [8000, 8001])
@pytest.mark.parametrize("n_fft,hop", [(512, 256), (512, 128)])
def test_istft_roundtrip(n_samples, n_fft, hop):
    rng = np.random.default_rng(2)
    x = rng.standard_normal(n_samples)
    spec = stft(x, n_fft=n_fft, hop_length=hop)
    y = np.asarray(istft(spec, n_fft=n_fft, hop_length=hop, length=n_samples))
    assert y.shape == (n_samples,)
    assert np.allclose(y, x, atol=1e-8)


def test_istft_matches_scipy():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(8000)
    _, _, spec = ss.stft(x, window="hann", nperseg=512, noverlap=256)
    _, want = ss.istft(spec, window="hann", nperseg=512, noverlap=256)
    got = np.asarray(istft(spec, n_fft=512, hop_length=256))
    n = min(len(got), len(want))
    assert np.allclose(got[:n], want[:n], atol=1e-10)


def test_stft_sc_matches_complex_stft():
    import jax.numpy as jnp

    from ssspy_tpu.transform import stft, stft_sc

    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 4000)).astype(np.float32)
    spec_c = np.asarray(stft(x, n_fft=512, hop_length=256))
    spec_sc = np.asarray(stft_sc(jnp.asarray(x), n_fft=512, hop_length=256))
    got = spec_sc[0] + 1j * spec_sc[1]
    np.testing.assert_allclose(got, spec_c, atol=1e-5)


def test_istft_sc_roundtrip():
    import jax.numpy as jnp

    from ssspy_tpu.transform import istft_sc, stft_sc

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3000)).astype(np.float32)
    spec = stft_sc(jnp.asarray(x), n_fft=256, hop_length=128)
    y = np.asarray(istft_sc(spec, n_fft=256, hop_length=128, length=3000))
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_stft_sc_f64_tight():
    """Under the x64 test config, planar f64 matches rfft at 1e-10."""
    import jax.numpy as jnp

    from ssspy_tpu.transform import stft, stft_sc

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 2000))
    spec_c = np.asarray(stft(x, n_fft=512, hop_length=256))
    spec_sc = np.asarray(stft_sc(jnp.asarray(x), n_fft=512, hop_length=256))
    np.testing.assert_allclose(spec_sc[0] + 1j * spec_sc[1], spec_c, atol=1e-10)
