"""Native (C++) host-runtime tests: WAV codec + convolutive mixer."""

import os
import struct

import numpy as np
import pytest

from ssspy_tpu import native
from ssspy_tpu.io import wavread, wavwrite

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


def test_wav_roundtrip_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    waveform = (rng.standard_normal((1600, 2)) * 0.1).clip(-1, 0.99)
    path = str(tmp_path / "x.wav")
    wavwrite(path, waveform, sample_rate=16000)

    # python reader vs native reader
    py, sr_py = wavread(path, return_2d=True)
    nat, sr_nat = native.wav_read(path)
    assert sr_py == sr_nat == 16000
    np.testing.assert_allclose(nat, py.reshape(nat.shape), atol=1e-6)


def test_wav_info(tmp_path):
    # 3-channel via the native writer (the python writer caps at stereo,
    # matching the reference ssspy/io/__init__.py)
    waveform = np.zeros((800, 3), dtype=np.int16)
    path = str(tmp_path / "y.wav")
    native.wav_write_i16(path, waveform, sample_rate=8000)
    ch, sr, bits, frames = native.wav_info(path)
    assert (ch, sr, bits, frames) == (3, 8000, 16, 800)


def test_native_write_read_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    pcm = (rng.standard_normal((500, 2)) * 8000).astype(np.int16)
    path = str(tmp_path / "z.wav")
    native.wav_write_i16(path, pcm, sample_rate=44100)

    out, sr = native.wav_read(path)
    assert sr == 44100
    np.testing.assert_allclose(out, pcm / 32768.0, atol=1e-7)

    # python reader agrees too
    py, sr_py = wavread(path, return_2d=True)
    assert sr_py == 44100
    np.testing.assert_allclose(py.reshape(out.shape), out, atol=1e-6)


def test_wav_read_offset(tmp_path):
    pcm = np.arange(100, dtype=np.int16)[:, None]
    path = str(tmp_path / "w.wav")
    native.wav_write_i16(path, pcm, sample_rate=8000)
    out, _ = native.wav_read(path, frame_offset=10, num_frames=5)
    np.testing.assert_allclose(out[:, 0] * 32768.0, np.arange(10, 15))


def test_wav_invalid_header(tmp_path):
    path = str(tmp_path / "bad.wav")
    with open(path, "wb") as f:
        f.write(b"RIFX" + b"\x00" * 40)
    with pytest.raises(ValueError):
        native.wav_info(path)


def test_wav_non_pcm_rejected(tmp_path):
    """IEEE-float format tag (3) is rejected as unsupported."""
    path = str(tmp_path / "float.wav")
    with open(path, "wb") as f:
        data_size = 0
        f.write(b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32))
        f.write(b"data" + struct.pack("<I", data_size))
    with pytest.raises(NotImplementedError):
        native.wav_info(path)


def test_convolutive_mix_matches_numpy():
    rng = np.random.default_rng(2)
    n_sources, n_mics, n_samples, n_taps = 3, 4, 2000, 17
    sources = rng.standard_normal((n_sources, n_samples))
    taps = rng.standard_normal((n_mics, n_sources, n_taps))

    mix = native.convolutive_mix(sources, taps)

    expected = np.zeros((n_mics, n_samples))
    for m in range(n_mics):
        for n in range(n_sources):
            expected[m] += np.convolve(sources[n], taps[m, n], mode="same")

    np.testing.assert_allclose(mix, expected, atol=1e-10)


def test_convolutive_mix_even_taps():
    rng = np.random.default_rng(3)
    sources = rng.standard_normal((2, 500))
    taps = rng.standard_normal((2, 2, 32))
    mix = native.convolutive_mix(sources, taps)
    expected = np.zeros((2, 500))
    for m in range(2):
        for n in range(2):
            expected[m] += np.convolve(sources[n], taps[m, n], mode="same")
    np.testing.assert_allclose(mix, expected, atol=1e-10)


def test_resample_preserves_sine():
    """Resampling a pure tone preserves frequency and amplitude."""
    sr_in, sr_out, f0 = 8000, 16000, 440.0
    t = np.arange(8000) / sr_in
    x = np.sin(2 * np.pi * f0 * t)

    y = native.resample(x, sr_in, sr_out)
    assert y.shape[-1] == 16000

    # compare against the ideal tone at the new rate (skip filter edges)
    t2 = np.arange(y.shape[-1]) / sr_out
    ref = np.sin(2 * np.pi * f0 * t2)
    np.testing.assert_allclose(y[200:-200], ref[200:-200], atol=2e-3)


def test_resample_downsample_antialias():
    """Content above the target Nyquist is attenuated on downsampling."""
    sr_in, sr_out = 16000, 8000
    t = np.arange(16000) / sr_in
    x_hi = np.sin(2 * np.pi * 6000.0 * t)  # above 4 kHz target Nyquist
    y = native.resample(x_hi, sr_in, sr_out)
    assert np.abs(y[200:-200]).max() < 0.05

    x_lo = np.sin(2 * np.pi * 1000.0 * t)
    y = native.resample(x_lo, sr_in, sr_out)
    assert np.abs(y[200:-200]).max() > 0.9


def test_resample_multichannel_shape():
    x = np.random.default_rng(0).standard_normal((3, 4000))
    y = native.resample(x, 8000, 12000)
    assert y.shape == (3, 6000)
