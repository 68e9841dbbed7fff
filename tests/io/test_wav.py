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


# ---- corruption paths (reference parity: tests/dummy/io.py:8-107 +
# tests/package/io/test_wavread.py:202-258 — each broken-RIFF variant
# must raise an EXPLICIT exception, never an opaque struct/numpy error) --


def _write_wav_bytes(
    path,
    riff=b"RIFF",
    ftype=b"WAVE",
    fmt_marker=b"fmt ",
    fmt_size=16,
    fmt_tag=1,
    n_channels=1,
    sample_rate=16000,
    byte_rate=None,
    block_align=None,
    bits=16,
    data_marker=b"data",
    n_frames=64,
    data_size=None,
    truncate_data=None,
    truncate_header=None,
):
    """Parametrized broken-RIFF writer (twin of the reference's
    save_invalid_wavfile, plus truncation variants)."""
    import struct as _struct

    if byte_rate is None:
        byte_rate = (bits * sample_rate * n_channels) // 8
    if block_align is None:
        block_align = (bits * n_channels) // 8
    rng = np.random.default_rng(42)
    payload = rng.integers(
        -(2 ** (bits - 1)), 2 ** (bits - 1), size=(n_frames * n_channels,),
    ).astype(f"<i{bits // 8}").tobytes()
    if data_size is None:
        data_size = len(payload)

    blob = b"".join(
        [
            riff,
            _struct.pack("<I", 36 + len(payload)),
            ftype,
            fmt_marker,
            _struct.pack("<I", fmt_size),
            _struct.pack("<H", fmt_tag),
            _struct.pack("<HIIHH", n_channels, sample_rate, byte_rate, block_align, bits),
            data_marker,
            _struct.pack("<I", data_size),
            payload,
        ]
    )
    if truncate_data is not None:
        blob = blob[: 44 + truncate_data]
    if truncate_header is not None:
        blob = blob[:truncate_header]
    with open(path, "wb") as f:
        f.write(blob)
    return str(path)


class TestWavreadCorruption:
    def test_invalid_riff_marker(self, tmp_path):
        path = _write_wav_bytes(tmp_path / "x.wav", riff=b"RIFX")
        with pytest.raises(NotImplementedError, match="little-endian RIFF"):
            wavread(path)

    def test_invalid_ftype(self, tmp_path):
        path = _write_wav_bytes(tmp_path / "x.wav", ftype=b"wave")
        with pytest.raises(NotImplementedError, match="Not a WAVE file"):
            wavread(path)

    def test_invalid_fmt_chunk_marker(self, tmp_path):
        path = _write_wav_bytes(tmp_path / "x.wav", fmt_marker=b"FMT ")
        with pytest.raises(NotImplementedError, match="Expected 'fmt ' chunk"):
            wavread(path)

    def test_invalid_fmt_chunk_size(self, tmp_path):
        path = _write_wav_bytes(tmp_path / "x.wav", fmt_size=15)
        with pytest.raises(NotImplementedError, match="malformed RIFF/WAVE header"):
            wavread(path)

    def test_non_pcm_format_tag(self, tmp_path):
        # fmt_tag=3 = IEEE float, fmt_tag=0 = the reference's invalid_fmt case
        for tag in (0, 3):
            path = _write_wav_bytes(tmp_path / "x.wav", fmt_tag=tag)
            with pytest.raises(NotImplementedError, match=f"Invalid header {tag}"):
                wavread(path)

    def test_invalid_byte_rate(self, tmp_path):
        path = _write_wav_bytes(tmp_path / "x.wav", byte_rate=16000 * 2 + 1)
        with pytest.raises(ValueError, match="malformed RIFF/WAVE header"):
            wavread(path)

    def test_invalid_block_align(self, tmp_path):
        path = _write_wav_bytes(tmp_path / "x.wav", block_align=3)
        with pytest.raises(ValueError, match="malformed RIFF/WAVE header"):
            wavread(path)

    def test_invalid_data_chunk_marker(self, tmp_path):
        path = _write_wav_bytes(tmp_path / "x.wav", data_marker=b"DATA")
        with pytest.raises(NotImplementedError, match="Expected 'data' chunk"):
            wavread(path)

    def test_truncated_data_chunk(self, tmp_path):
        # data chunk declares 64 frames but the file holds half of them:
        # must be an explicit truncation error, not a numpy buffer error
        path = _write_wav_bytes(tmp_path / "x.wav", truncate_data=64)
        with pytest.raises(ValueError, match="truncated RIFF/WAVE file"):
            wavread(path)

    def test_truncated_header(self, tmp_path):
        path = _write_wav_bytes(tmp_path / "x.wav", truncate_header=20)
        with pytest.raises(ValueError, match="truncated RIFF/WAVE file"):
            wavread(path)

    def test_zero_channels(self, tmp_path):
        path = _write_wav_bytes(
            tmp_path / "x.wav", n_channels=0, byte_rate=0, block_align=1
        )
        with pytest.raises(ValueError, match="malformed RIFF/WAVE header"):
            wavread(path)
