"""Headline benchmark: AuxIVA-IP1, 100 iterations, 8-ch 10 s mixture.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

- value: iterations/sec of the jitted ssspy_tpu runner on the current
  default JAX backend (TPU when available).
- vs_baseline: speedup over the NumPy reference (tky823/ssspy) measured
  live on this host's CPU when /root/reference is importable, otherwise
  against a recorded CPU denominator.

Workload matches BASELINE.md: 16 kHz, 10 s, 8 channels, STFT n_fft=512
hop=256 (257 bins x ~627 frames), 100 AuxIVA iterations.
"""

import json
import sys
import time

import numpy as np

N_CHANNELS = 8
SAMPLE_RATE = 16_000
DURATION_S = 10.0
N_FFT, HOP = 512, 256
N_ITER = 100

# NumPy reference its/sec for this exact workload, measured on this image's
# CPU (fallback when /root/reference is not importable at bench time).
FALLBACK_NUMPY_ITERS_PER_SEC = None  # filled from calibration run if needed


def make_mixture(seed=0):
    """Synthetic convolutive 8-ch mixture (no dataset download: zero egress)."""
    rng = np.random.default_rng(seed)
    n_samples = int(SAMPLE_RATE * DURATION_S)
    sources = rng.laplace(size=(N_CHANNELS, n_samples))
    # short random FIR mixing (convolutive, 32 taps)
    taps = rng.standard_normal((N_CHANNELS, N_CHANNELS, 32)) * np.exp(
        -0.2 * np.arange(32)
    )
    mix = np.zeros_like(sources)
    for m in range(N_CHANNELS):
        for n in range(N_CHANNELS):
            mix[m] += np.convolve(sources[n], taps[m, n], mode="same")
    return mix


def bench_jax(spectrogram):
    import jax
    import jax.numpy as jnp

    from ssspy_tpu.parallel import make_batched_auxiva_runner, make_mesh

    mesh = make_mesh()
    runner = make_batched_auxiva_runner(mesh)

    X = jnp.asarray(spectrogram[None], dtype=jnp.complex64)  # (1, M, I, T)
    n_bins = X.shape[2]
    W = jnp.tile(jnp.eye(N_CHANNELS, dtype=jnp.complex64), (1, n_bins, 1, 1))

    runner(X, W, N_ITER).block_until_ready()  # compile
    t0 = time.perf_counter()
    runner(X, W, N_ITER).block_until_ready()
    dt = time.perf_counter() - t0
    return N_ITER / dt


def bench_numpy(spectrogram, n_iter=10):
    """Reference denominator, measured live. Returns its/sec or None."""
    sys.path.insert(0, "/root/reference")
    try:
        from ssspy.bss.iva import AuxIVA
    except Exception:
        return None
    iva = AuxIVA(
        spatial_algorithm="IP1",
        contrast_fn=lambda y: 2 * np.linalg.norm(y, axis=1),
        d_contrast_fn=lambda y: 2 * np.ones_like(y),
        record_loss=False,
        scale_restoration=False,
    )
    spec = spectrogram.astype(np.complex128)
    iva(spec, n_iter=1)  # warm caches
    t0 = time.perf_counter()
    iva(spec, n_iter=n_iter)
    dt = time.perf_counter() - t0
    return n_iter / dt


def main():
    mix = make_mixture()

    from ssspy_tpu.transform import stft

    spec = np.asarray(stft(mix, n_fft=N_FFT, hop_length=HOP))

    jax_ips = bench_jax(spec)
    np_ips = bench_numpy(spec)
    if np_ips is None:
        np_ips = FALLBACK_NUMPY_ITERS_PER_SEC

    vs_baseline = (jax_ips / np_ips) if np_ips else None
    print(
        json.dumps(
            {
                "metric": "auxiva_ip1_8ch_10s_iters_per_sec",
                "value": round(jax_ips, 3),
                "unit": "iterations/sec",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
