"""End-to-end separation pipeline: waveform -> STFT -> BSS -> iSTFT.

The reference leaves STFT/iSTFT to the user (its tests call
``scipy.signal.stft``; the package itself has no transform —
SURVEY.md key facts). Here the full path is one call.
"""

from typing import Optional, Union

import jax.numpy as jnp
import numpy as np

from .transform import istft, stft

__all__ = ["separate"]


def separate(
    waveform,
    method,
    n_iter: int = 100,
    n_fft: int = 512,
    hop_length: Optional[int] = None,
    window: Union[str, np.ndarray] = "hann",
    **kwargs,
):
    """Separate a time-domain multichannel mixture end to end.

    ``waveform``: ``(n_channels, n_samples)``; ``method``: any
    frequency-domain separator from :mod:`ssspy_tpu.bss` (AuxIVA,
    GaussILRMA, CACGMM, HVA, ...). Extra ``kwargs`` are warm-start
    state forwarded to ``method.__call__``.

    Returns the separated waveforms ``(n_sources, n_samples)``.

    >>> from ssspy_tpu.bss.iva import AuxLaplaceIVA
    >>> y = separate(mixture, AuxLaplaceIVA(spatial_algorithm="IP"), n_iter=50)
    """
    waveform = jnp.asarray(waveform)
    assert waveform.ndim == 2, "waveform must be (n_channels, n_samples)"
    n_samples = waveform.shape[-1]

    spectrogram = stft(waveform, n_fft=n_fft, hop_length=hop_length, window=window)
    separated = method(spectrogram, n_iter=n_iter, **kwargs)
    return istft(
        separated,
        n_fft=n_fft,
        hop_length=hop_length,
        window=window,
        length=n_samples,
    )
