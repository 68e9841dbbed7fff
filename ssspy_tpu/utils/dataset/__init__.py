"""Sample-mixture utilities.

The reference downloads SiSEC2010 speech and MIRD room impulse responses
(ssspy/utils/dataset/__init__.py:13-99). This environment has no network
egress, so :func:`download_sample_speech_data` synthesizes deterministic
speech-like sources and convolutive room responses locally with the same
output contract: ``(waveform_src_img, sample_rate)`` where
``waveform_src_img`` has shape ``(n_sources, n_channels, n_samples)``.
"""

import os
from typing import Optional, Tuple

import numpy as np


def _sparse_envelope(rng, n_samples, events_per_sec, sample_rate, smooth):
    """Sparse syllabic on/off envelope (independent across sources)."""
    smooth = max(1, min(smooth, n_samples))  # convolve("same") follows the longer operand
    onsets = rng.random(n_samples) < events_per_sec / sample_rate
    env = np.convolve(onsets.astype(float), np.ones(smooth), mode="same")
    return np.clip(env, 0.0, 1.0)


def _synthetic_speech_like(rng: np.random.Generator, n_samples: int, sample_rate: int):
    """Deterministic speech-like signal: syllabically-gated harmonics +
    sparsely-gated wideband bursts.

    Both components ride SPARSE independent envelopes: a stationary
    (constant-envelope) component is Gaussian in every STFT bin and
    fundamentally unseparable by ICA/IVA-family methods, so the synthetic
    sources must be strongly non-stationary to exercise separation
    meaningfully (super-Gaussian bin marginals through amplitude
    modulation — the same property real speech has).
    """
    t = np.arange(n_samples) / sample_rate
    f0 = rng.uniform(90.0, 250.0)
    smooth = int(0.12 * sample_rate)  # ~120 ms syllables
    # ONE envelope per source, shared by every component: IVA's source
    # model is a single co-modulating envelope across all bins, so
    # independently-gated harmonics would read as several distinct
    # narrowband sources and make the mixture unseparable by design.
    # 15% envelope baseline: fully-silent frames make NMF-model paths
    # (ILRMA/MNMF/HVA) blow up in f32; the co-modulating 85% still
    # dominates, which is what ICA/IVA-family separation keys on
    env = 0.15 + 0.85 * _sparse_envelope(rng, n_samples, 4.0, sample_rate, smooth)
    sig = np.zeros(n_samples)
    for k in range(1, 6):
        sig += np.sin(2 * np.pi * k * f0 * t + rng.uniform(0, 2 * np.pi)) / k
    # wideband "consonant" component under the same syllabic gate
    sig += 0.5 * rng.standard_normal(n_samples)
    sig = env * sig
    return sig / np.max(np.abs(sig))


def _synthetic_rir(
    rng: np.random.Generator, n_channels: int, n_taps: int, decay: float = 0.995
):
    """Exponentially-decaying sparse echo pattern per channel."""
    rir = np.zeros((n_channels, n_taps))
    for ch in range(n_channels):
        direct = rng.integers(4, 16)
        rir[ch, direct] = 1.0
        n_echo = 24
        pos = rng.integers(direct + 1, n_taps, size=n_echo)
        rir[ch, pos] += rng.standard_normal(n_echo) * (decay ** pos) * 0.5
    return rir


def download_sample_speech_data(
    root: str = ".data",
    n_sources: int = 3,
    sisec2010_tag: str = "dev1_female3",
    max_duration: float = 10.0,
    conv: bool = True,
    cache_dir: Optional[str] = None,
    seed: int = 42,
    sample_rate: int = 16000,
) -> Tuple[np.ndarray, int]:
    """Build a deterministic multichannel mixture test fixture.

    Returns ``(waveform_src_img, sample_rate)`` with ``waveform_src_img`` of
    shape ``(n_sources, n_channels, n_samples)``: per-source microphone
    images (convolutive if ``conv=True``, instantaneous otherwise) with
    ``n_channels == n_sources``, matching the reference dataset contract.
    """
    n_samples = int(max_duration * sample_rate)
    n_channels = n_sources

    cache_root = cache_dir or root
    cache_path = os.path.join(
        cache_root,
        f"synth_v2_{sisec2010_tag}_{n_sources}src_{max_duration}s_{'conv' if conv else 'inst'}_{seed}.npz",
    )
    if os.path.exists(cache_path):
        npz = np.load(cache_path)
        return npz["waveform_src_img"], int(npz["sample_rate"])

    rng = np.random.default_rng(seed + 1000 * n_sources + (1 if conv else 0))
    sources = np.stack(
        [_synthetic_speech_like(rng, n_samples, sample_rate) for _ in range(n_sources)]
    )

    if conv:
        n_taps = min(2048, n_samples // 4)
        images = np.zeros((n_sources, n_channels, n_samples))
        for src in range(n_sources):
            rir = _synthetic_rir(rng, n_channels, n_taps)
            for ch in range(n_channels):
                full = np.convolve(sources[src], rir[ch])
                images[src, ch] = full[:n_samples]
    else:
        mixing = rng.standard_normal((n_channels, n_sources))
        images = mixing.T[:, :, None] * sources[:, None, :]

    os.makedirs(cache_root, exist_ok=True)
    np.savez(cache_path, waveform_src_img=images, sample_rate=sample_rate)
    return images, sample_rate
