import numpy as np
import pytest

from ssspy_tpu.io import wavread, wavwrite


def test_roundtrip_mono(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.uniform(-0.9, 0.9, 1600)
    path = str(tmp_path / "mono.wav")
    wavwrite(path, x, 16000)
    y, sr = wavread(path)
    assert sr == 16000
    assert y.shape == (1600,)
    assert np.allclose(y, x, atol=2 ** -15 + 1e-9)


def test_roundtrip_stereo_channels_first(tmp_path):
    rng = np.random.default_rng(1)
    x = rng.uniform(-0.9, 0.9, (2, 800))
    path = str(tmp_path / "stereo.wav")
    wavwrite(path, x, 8000, channels_first=True)
    y, sr = wavread(path, channels_first=True)
    assert sr == 8000
    assert y.shape == (2, 800)
    assert np.allclose(y, x, atol=2 ** -15 + 1e-9)


def test_frame_offset_and_num_frames(tmp_path):
    x = np.linspace(-0.5, 0.5, 1000)
    path = str(tmp_path / "seek.wav")
    wavwrite(path, x, 16000)
    y_full, _ = wavread(path)
    y_part, _ = wavread(path, frame_offset=100, num_frames=200)
    assert y_part.shape == (200,)
    assert np.allclose(y_part, y_full[100:300])


def test_num_frames_overrun_raises(tmp_path):
    x = np.zeros(100)
    path = str(tmp_path / "short.wav")
    wavwrite(path, x, 16000)
    with pytest.raises(ValueError):
        wavread(path, frame_offset=50, num_frames=100)


def test_invalid_extension():
    with pytest.raises(AssertionError):
        wavwrite("/tmp/foo.mp3", np.zeros(10), 16000)


def test_reads_reference_writer_output(tmp_path):
    """Cross-check against the reference writer if available."""
    try:
        from ssspy import wavwrite as ref_wavwrite
    except ImportError:
        pytest.skip("reference unavailable")
    rng = np.random.default_rng(2)
    x = rng.uniform(-0.9, 0.9, 500)
    path = str(tmp_path / "ref.wav")
    ref_wavwrite(path, x, 16000)
    y, sr = wavread(path)
    assert sr == 16000
    assert np.allclose(y, x, atol=2 ** -15 + 1e-9)
