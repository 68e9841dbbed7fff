"""Round-4 harvest confirmation: IPA auto paths + PDS/ADMM rework.

One idle-host session, house timing methodology (300-iteration chained
scans + host readback) at the BASELINE shapes.

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/tpu_r4_confirm.py
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
    Xs = Ys
    Tb = jax.device_put((rng.random((M, I, K)) + 0.1).astype(np.float32))
    Vb = jax.device_put((rng.random((M, K, T)) + 0.1).astype(np.float32))
    Wd = np.zeros((2, I, M, M), dtype=np.float32)
    Wd[0] = np.eye(M, dtype=np.float32)
    Wd = jax.device_put(Wd)
    print(f"shapes: M={M} I={I} T={T}", flush=True)

    r = bench._chain_scan(
        lambda c: sc.auxiva_ipa_step_sc(c), Ys, lambda c: c, n_iter=300, reps=3
    )
    print(f"auxiva_ipa[auto]: {r:.1f} it/s", flush=True)

    r = bench._chain_scan(
        lambda c: sc.gauss_ilrma_ipa_step_sc(*c),
        (Ys, Tb, Vb),
        lambda c: c[0],
        n_iter=300,
        reps=3,
    )
    print(f"ilrma_ipa[auto]: {r:.1f} it/s", flush=True)

    Y0 = jax.device_put(np.zeros((2, M, I, T), dtype=np.float32))
    r = bench._chain_scan(
        lambda c: sc.pds_iva_step_sc(Xs, *c), (Wd, Y0), lambda c: c[0],
        n_iter=300, reps=3,
    )
    print(f"pds_iva[relax-spec]: {r:.1f} it/s", flush=True)

    zf = jax.device_put(np.zeros((2, I, M, M), dtype=np.float32))
    zs = jax.device_put(np.zeros((2, M, I, T), dtype=np.float32))
    quad = jax.jit(sc.admm_quad_inv_sc)(Xs)

    def admm_new(c):
        _, V, Vt, Y, Yt = sc.admm_iva_step_sc(Xs, *c, quad_inv=quad)
        return (V, Vt, Y, Yt)

    r = bench._chain_scan(admm_new, (zf, zs, zf, zs), lambda c: c[0], n_iter=300, reps=3)
    print(f"admm_iva[quad_inv]: {r:.1f} it/s", flush=True)

    def admm_old(c):
        _, V, Vt, Y, Yt = sc.admm_iva_step_sc(Xs, *c)
        return (V, Vt, Y, Yt)

    r = bench._chain_scan(admm_old, (zf, zs, zf, zs), lambda c: c[0], n_iter=300, reps=3)
    print(f"admm_iva[in-scan solve]: {r:.1f} it/s", flush=True)


if __name__ == "__main__":
    main()
