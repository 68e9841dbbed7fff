"""STFT / iSTFT matching ``scipy.signal.stft``/``istft`` conventions.

The reference package contains no STFT; its tests and notebooks feed
``scipy.signal.stft`` output (e.g. tests/package/bss/test_iva.py:162-164
with ``nperseg=512, noverlap=256``). To be self-contained end-to-end, this
module provides a batched, jittable STFT with the exact scipy conventions:

- periodic window (``sym=False``), default Hann,
- ``boundary="zeros"``: ``nperseg//2`` zeros prepended/appended,
- ``padded=True``: zero-pad so frames tile the signal exactly,
- forward scaling ``1 / win.sum()``, least-squares overlap-add inverse.

Framing uses a static strided gather; the whole transform is one XLA
program batched over arbitrary leading (channel / utterance) axes.
"""

from typing import Optional, Union

import jax.numpy as jnp
import numpy as np

__all__ = ["stft", "istft", "get_window"]


def get_window(window: Union[str, np.ndarray], n: int) -> jnp.ndarray:
    """Return a periodic analysis window of length ``n``."""
    if isinstance(window, str):
        if window == "hann":
            w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)
        elif window == "hamming":
            w = 0.54 - 0.46 * np.cos(2 * np.pi * np.arange(n) / n)
        elif window in ("boxcar", "rect", "rectangular"):
            w = np.ones(n)
        else:
            raise ValueError(f"Unsupported window: {window}.")
    else:
        w = np.asarray(window)
        assert w.shape == (n,), f"window shape {w.shape} != ({n},)"
    return jnp.asarray(w)


def stft(
    waveform,
    n_fft: int = 512,
    hop_length: Optional[int] = None,
    window: Union[str, np.ndarray] = "hann",
    center: bool = True,
):
    """Short-time Fourier transform of ``(*, n_samples)`` signals.

    Returns a complex spectrogram of shape ``(*, n_bins, n_frames)`` with
    ``n_bins = n_fft // 2 + 1``, numerically matching
    ``scipy.signal.stft(x, nperseg=n_fft, noverlap=n_fft - hop_length)[2]``.
    """
    if hop_length is None:
        hop_length = n_fft // 2

    x = jnp.asarray(waveform)
    win = get_window(window, n_fft).astype(x.dtype)
    n_samples = x.shape[-1]

    pad_left = n_fft // 2 if center else 0
    total = n_samples + 2 * pad_left
    # pad tail so (total - n_fft) is a whole number of hops
    n_frames = max(int(np.ceil((total - n_fft) / hop_length)), 0) + 1
    pad_right = (n_frames - 1) * hop_length + n_fft - total + pad_left

    pad_width = [(0, 0)] * (x.ndim - 1) + [(pad_left, pad_right)]
    x = jnp.pad(x, pad_width)

    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    frames = x[..., idx]  # (*, n_frames, n_fft)
    spec = jnp.fft.rfft(frames * win, n=n_fft, axis=-1)
    spec = spec / jnp.sum(win)
    return jnp.swapaxes(spec, -2, -1)  # (*, n_bins, n_frames)


def istft(
    spectrogram,
    n_fft: int = 512,
    hop_length: Optional[int] = None,
    window: Union[str, np.ndarray] = "hann",
    center: bool = True,
    length: Optional[int] = None,
):
    """Inverse STFT via least-squares (windowed) overlap-add.

    Accepts ``(*, n_bins, n_frames)`` complex spectrograms from
    :func:`stft` and returns ``(*, n_samples)`` signals, matching
    ``scipy.signal.istft`` for the same window/hop.
    """
    if hop_length is None:
        hop_length = n_fft // 2

    spec = jnp.asarray(spectrogram)
    n_frames = spec.shape[-1]
    rdtype = jnp.zeros((), dtype=spec.dtype).real.dtype
    win = get_window(window, n_fft).astype(rdtype)

    frames = jnp.fft.irfft(jnp.swapaxes(spec, -2, -1), n=n_fft, axis=-1)
    frames = frames * jnp.sum(win) * win  # undo forward scaling, LS window

    total = (n_frames - 1) * hop_length + n_fft
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]

    batch_shape = spec.shape[:-2]
    out = jnp.zeros(batch_shape + (total,), dtype=rdtype)
    out = out.at[..., idx.reshape(-1)].add(frames.reshape(batch_shape + (-1,)))

    norm = jnp.zeros((total,), dtype=rdtype)
    norm = norm.at[idx.reshape(-1)].add(jnp.tile(win**2, n_frames))
    norm = jnp.where(norm > 1e-10, norm, 1.0)
    out = out / norm

    pad_left = n_fft // 2 if center else 0
    out = out[..., pad_left:]
    if length is not None:
        out = out[..., :length]
    return out
