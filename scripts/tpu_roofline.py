"""Roofline decomposition of the flagship AuxIVA-IP1 step on the v5e chip.

Times the step's three stages as standalone chained programs, assigns
each its analytic HBM-byte and FLOP counts from the array shapes, and
compares against the chip's peaks to name the binding resource. Run on
an OTHERWISE IDLE host (concurrent CPU load distorts dispatch timing):

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_roofline.py

The stage programs chain data-dependent executions and end with a host
readback, like scripts/tpu_bench.py (the only trustworthy barrier on the
remote-execution backend).
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e public peaks (per chip)
HBM_GBPS = 819.0
BF16_TFLOPS = 197.0
F32_TFLOPS = BF16_TFLOPS / 2


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import bench
    from ssspy_tpu.ops import splitc as sc
    from ssspy_tpu.ops.pallas_kernels import weighted_covariance_sc

    spec = bench.host_stft(bench.make_mixture())
    M, I, T = spec.shape
    Xs = jax.device_put(np.stack([spec.real, spec.imag]).astype(np.float32))
    W0 = np.zeros((2, I, M, M), dtype=np.float32)
    W0[0] = np.eye(M, dtype=np.float32)
    Wd = jax.device_put(W0)

    n_iter, reps = 100, 3

    def timed(name, step, carry, read):
        @functools.partial(jax.jit, static_argnums=1)
        def runner(c, n):
            return lax.scan(lambda c, _: (step(c), None), c, None, length=n)[0]

        np.asarray(read(runner(carry, n_iter)))
        c = carry
        t0 = time.perf_counter()
        for _ in range(reps):
            c = runner(c, n_iter)
        np.asarray(read(c))
        us = (time.perf_counter() - t0) / reps / n_iter * 1e6
        print(f"{name}: {us:8.1f} us/iter", flush=True)
        return us

    # full step
    full = timed("full_step", lambda w: sc.auxiva_ip1_step_sc(Xs, w), Wd, lambda c: c)

    # stage 1: separation + weight (reads X, writes Y-norm)
    def sep_only(w):
        Yr, Yi = sc._csep(w[0], w[1], Xs[0], Xs[1])
        norm = jnp.sqrt(jnp.sum(Yr**2 + Yi**2, axis=1))
        return w * (1 + 1e-12 * norm.mean())

    sep = timed("separation+norm", sep_only, Wd, lambda c: c)

    # stage 2: weighted covariance (pallas kernel; reads X once)
    phi = jax.device_put(np.random.default_rng(0).random((M, T)).astype(np.float32))

    def cov_only(w):
        Ur, Ui = weighted_covariance_sc(Xs[0], Xs[1], phi)
        return w * (1 + 1e-12 * Ur.mean())

    cov = timed("weighted_covariance", cov_only, Wd, lambda c: c)

    # stage 3: IP1 sweep on fixed covariances (small arrays, many ops)
    rng = np.random.default_rng(1)
    A = rng.standard_normal((I, M, M, 2)).astype(np.float32)
    Ur0 = np.einsum("impx,inpx->imn", A, A) + M * np.eye(M, dtype=np.float32)
    Ur0 = np.broadcast_to(Ur0[:, None], (I, M, M, M)).copy()
    Ui0 = np.zeros_like(Ur0)
    Urd, Uid = jax.device_put(Ur0), jax.device_put(Ui0)

    def sweep_only(w):
        Wr, Wi = sc.ip1_sweep_sc(w[0], w[1], Urd, Uid)
        return jnp.stack([Wr, Wi], axis=0)

    sweep = timed("ip1_sweep", sweep_only, Wd, lambda c: c)

    # analytic costs
    x_bytes = Xs.size * 4
    u_bytes = 2 * I * M * M * M * 4
    y_bytes = 2 * M * I * T * 4

    sep_flops = 8 * M * M * I * T  # complex matmul = 4 real mult-adds
    cov_flops = 8 * M * M * I * T
    sweep_flops = M * (2 * M) ** 3 * I * 3  # rough: M solves of 2Mx2M GJ

    print("\n-- analytic per-iteration costs --")
    for name, us, fl, by in (
        ("separation+norm", sep, sep_flops, x_bytes + y_bytes),
        ("weighted_covariance", cov, cov_flops, x_bytes + u_bytes),
        ("ip1_sweep", sweep, sweep_flops, 3 * u_bytes),
    ):
        fl_t = fl / (us * 1e-6) / 1e12
        bw = by / (us * 1e-6) / 1e9
        print(
            f"{name}: {fl/1e6:.1f} MFLOP, {by/1e6:.1f} MB -> "
            f"{fl_t:.2f} TFLOP/s ({100*fl_t/F32_TFLOPS:.1f}% f32 peak), "
            f"{bw:.0f} GB/s ({100*bw/HBM_GBPS:.0f}% HBM peak)"
        )
    print(f"\nstage sum {sep+cov+sweep:.1f} us vs full {full:.1f} us "
          f"(gap = inter-op overheads / non-fused glue)")


if __name__ == "__main__":
    main()
