"""Trip-count sensitivity of the IPA step on the current backend.

The post-congruence profile leaves the LQPQM scalar chain as the
suspected bound: per source, the shift-invert phi_max estimate runs 8
pivot-sign bisection Cholesky rounds and the secular solver 12
resolvent trips (each an unrolled 14x14 Cholesky + triangular inverse).
This sweeps both budgets to measure the per-trip cost directly.

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/tpu_ipa_trips.py
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
    Ys = jax.device_put(np.stack([spec.real, spec.imag]).astype(np.float32))
    print(f"shapes: M={M} I={I} T={T}", flush=True)

    for trips in (12, 6, 2):
        r = bench._chain_scan(
            lambda c, trips=trips: sc.auxiva_ipa_step_sc(
                c, stats_impl="direct", secular_trips=trips
            ),
            Ys,
            lambda c: c,
            n_iter=300,
            reps=3,
        )
        print(f"auxiva_ipa[secular_trips={trips}]: {r:.1f} it/s", flush=True)


if __name__ == "__main__":
    main()
