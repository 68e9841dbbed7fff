"""A/B the IPA sweep's statistics paths on the current backend.

Times auxiva_ipa_step_sc and gauss_ilrma_ipa_step_sc with
stats_impl="direct" (reference data flow: per-source covariance
recompute + rank-1 spectrogram updates) vs "congruence" (one stack +
one final transform) at the BASELINE shapes, with the house timing
methodology (chained 300-iteration scans + host readback).

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/tpu_ipa_ab.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    import bench
    from ssspy_tpu.ops import splitc as sc

    spec = bench.host_stft(bench.make_mixture())
    M, I, T = spec.shape
    K = 8
    rng = np.random.default_rng(0)
    Ys = jax.device_put(np.stack([spec.real, spec.imag]).astype(np.float32))
    Tb = jax.device_put((rng.random((M, I, K)) + 0.1).astype(np.float32))
    Vb = jax.device_put((rng.random((M, K, T)) + 0.1).astype(np.float32))
    print(f"shapes: M={M} I={I} T={T}", flush=True)

    cases = (
        ("direct", "xla"),
        ("congruence", "xla"),
        ("congruence", "pallas"),
    )
    for stats, cong in cases:
        r = bench._chain_scan(
            lambda c, stats=stats, cong=cong: sc.auxiva_ipa_step_sc(
                c, stats_impl=stats, congruence_impl=cong
            ),
            Ys,
            lambda c: c,
            n_iter=300,
            reps=3,
        )
        print(f"auxiva_ipa[{stats}/{cong}]: {r['median']:.1f} it/s "
              f"[{r['min']:.1f}, {r['max']:.1f}]", flush=True)

    for stats, cong in cases:
        r = bench._chain_scan(
            lambda c, stats=stats, cong=cong: sc.gauss_ilrma_ipa_step_sc(
                *c, stats_impl=stats, congruence_impl=cong
            ),
            (Ys, Tb, Vb),
            lambda c: c[0],
            n_iter=300,
            reps=3,
        )
        print(f"ilrma_ipa[{stats}/{cong}]: {r['median']:.1f} it/s "
              f"[{r['min']:.1f}, {r['max']:.1f}]", flush=True)


if __name__ == "__main__":
    main()
