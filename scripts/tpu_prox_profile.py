"""Stage-level decomposition of the PDS / ADMM IVA steps on the backend.

VERDICT r3 item #3: ADMMIVA (318 it/s) vs PDSIVA (866) is a 2.7x
intra-family gap with no analysis. Times each stage of one iteration as
its own chained-scan program (chained data-dependent executions + host
readback barrier) at the BASELINE shapes (M=8, I=257, T=627, f32).

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_prox_profile.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain(step, carry, read_leaf, n=100, reps=3):
    import jax
    from jax import lax

    @functools.partial(jax.jit, static_argnums=1)
    def runner(c, k):
        return lax.scan(lambda c, _: (step(c), None), c, None, length=k)[0]

    np.asarray(read_leaf(runner(carry, n)))
    c = carry
    t0 = time.perf_counter()
    for _ in range(reps):
        c = runner(c, n)
    np.asarray(read_leaf(c))
    return (time.perf_counter() - t0) / reps / n * 1e3  # ms/call


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from ssspy_tpu.ops import splitc as sc

    spec = bench.host_stft(bench.make_mixture())
    M, I, T = spec.shape
    Xs = jax.device_put(np.stack([spec.real, spec.imag]).astype(np.float32))
    Xr, Xi = Xs[0], Xs[1]
    print(f"shapes: M={M} I={I} T={T}", flush=True)

    results = {}

    def rec(name, ms):
        results[name] = ms
        print(f"{name:28s} {ms:8.3f} ms", flush=True)

    Wd = np.zeros((2, I, M, M), dtype=np.float32)
    Wd[0] = np.eye(M, dtype=np.float32)
    Wd = jax.device_put(Wd)
    Y0 = jax.device_put(np.zeros((2, M, I, T), dtype=np.float32))

    # ---- full steps ------------------------------------------------------
    rec(
        "pds_full",
        chain(lambda c: sc.pds_iva_step_sc(Xs, *c), (Wd, Y0), lambda c: c[0]),
    )

    def admm_step(c):
        _, V, Vt, Y, Yt = sc.admm_iva_step_sc(Xs, *c)
        return V, Vt, Y, Yt

    zf = jax.device_put(np.zeros((2, I, M, M), dtype=np.float32))
    zs = jax.device_put(np.zeros((2, M, I, T), dtype=np.float32))
    admm0 = (zf, zs, jnp.copy(zf), jnp.copy(zs))
    rec("admm_full", chain(admm_step, admm0, lambda c: c[0]))

    # warm ADMM state for realistic stage operands
    warm = admm0
    run5 = jax.jit(
        lambda c: functools.reduce(lambda a, _: admm_step(a), range(5), c)
    )
    warm = run5(admm0)
    Vs, Vts, Ys, Yts = warm
    Vr, Vi = Vs[0], Vs[1]
    VTr, VTi = Vts[0] - Yts[0], Vts[1] - Yts[1]

    # ---- ADMM stages -----------------------------------------------------
    def stage_xx(c):
        Vs = c
        XXr = jnp.einsum("mit,pit->imp", Xr, Xr) + jnp.einsum("mit,pit->imp", Xi, Xi)
        XXi = jnp.einsum("mit,pit->imp", Xr, Xi) - jnp.einsum("mit,pit->imp", Xi, Xr)
        return Vs + 1e-12 * XXr[0, 0, 0] + 1e-12 * XXi[0, 0, 0]

    rec("admm_xx_einsums", chain(stage_xx, Vs, lambda c: c))

    def stage_xvy(c):
        Vs = c
        XVYr = jnp.einsum("mit,nit->imn", Xr, VTr) + jnp.einsum("mit,nit->imn", Xi, VTi)
        XVYi = jnp.einsum("mit,nit->imn", Xr, VTi) - jnp.einsum("mit,nit->imn", Xi, VTr)
        return Vs + 1e-12 * XVYr[0, 0, 0] + 1e-12 * XVYi[0, 0, 0]

    rec("admm_xvy_einsums", chain(stage_xvy, Vs, lambda c: c))

    XXr = jnp.einsum("mit,pit->imp", Xr, Xr) + jnp.einsum("mit,pit->imp", Xi, Xi)
    XXi = jnp.einsum("mit,pit->imp", Xr, Xi) - jnp.einsum("mit,pit->imp", Xi, Xr)
    E = jnp.eye(M, dtype=np.float32)
    Ar = XXr + E

    def stage_quad_solve(c):
        Br, Bi = c
        Wr, Wi = sc.csolve_matrix(Ar, XXi, Br, Bi)
        return Br + 1e-12 * Wr[0, 0, 0], Bi

    rec("admm_quad_solve", chain(stage_quad_solve, (Vr, Vi), lambda c: c[0]))

    def stage_csep(c):
        Wr, Wi = c
        XWr, XWi = sc._csep(Wr, Wi, Xr, Xi)
        return Wr + 1e-12 * XWr[0, 0, 0], Wi

    rec("csep", chain(stage_csep, (Vr, Vi), lambda c: c[0]))

    def stage_prox_logdet_lift(c):
        Gr, Gi = c
        Pr, Pi = sc.prox_neg_logdet_sc(Gr, Gi, step_size=1.0, lift_null=True)
        return Gr + 1e-12 * Pr[0, 0, 0], Gi

    rec("prox_logdet(lift)", chain(stage_prox_logdet_lift, (Vr, Vi), lambda c: c[0]))

    def stage_prox_logdet(c):
        Gr, Gi = c
        Pr, Pi = sc.prox_neg_logdet_sc(Gr, Gi, step_size=1.0, lift_null=False)
        return Gr + 1e-12 * Pr[0, 0, 0], Gi

    rec("prox_logdet(no lift)", chain(stage_prox_logdet, (Vr, Vi), lambda c: c[0]))

    def stage_prox_l21(c):
        Zr, Zi = c
        Pr, Pi = sc.prox_l21_sc(Zr, Zi, step_size=1.0)
        return Zr + 1e-12 * Pr[0, 0, 0], Zi

    rec("prox_l21", chain(stage_prox_l21, (Vts[0], Vts[1]), lambda c: c[0]))

    admm_sum = (
        results["admm_xx_einsums"]
        + results["admm_xvy_einsums"]
        + results["admm_quad_solve"]
        + results["csep"]
        + results["prox_logdet(lift)"]
        + results["prox_l21"]
    )
    print(f"\nADMM sum(stages) = {admm_sum:.3f} ms vs full {results['admm_full']:.3f} ms", flush=True)
    print(f"PDS full = {results['pds_full']:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
