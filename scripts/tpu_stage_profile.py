"""Stage-level decomposition of the slow-quartile TPU steps.

Times each stage of the IPSDTA and dense-MNMF iterations as its own
chained-scan program on the current backend (methodology of
scripts/tpu_roofline.py: chained data-dependent executions + host
readback barrier). Usage:

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_stage_profile.py ipsdta mnmf
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def chain(step, carry, read_leaf, n=30, reps=3):
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
    return (time.perf_counter() - t0) / reps / n * 1e3  # ms/iter


def profile_ipsdta():
    import jax
    import jax.numpy as jnp

    from ssspy_tpu.ops import splitc as sc

    rng = np.random.default_rng(0)
    M, I, T, K, n_blocks = 8, 256, 627, 4, 64
    J = I // n_blocks
    Xs = jax.device_put(rng.standard_normal((2, M, I, T)).astype(np.float32))
    W0 = np.zeros((2, I, M, M), dtype=np.float32)
    W0[0] = np.eye(M)
    Tb = np.tile(np.eye(J, dtype=np.float32), (M, K, n_blocks, 1, 1)) * 0.5 + 0.1
    T_parts = (jnp.asarray(np.stack([Tb, np.zeros_like(Tb)])),)
    V0 = jax.device_put((rng.random((M, K, T)) + 0.1).astype(np.float32))
    W = jax.device_put(W0)

    def _step(c):
        Wn, Tn, Vn = sc.ipsdta_vcd_step_sc(Xs, c[0], (c[1],), c[2])
        return (Wn, Tn[0], Vn)

    full = chain(_step, (W, T_parts[0], V0), lambda c: c[0])
    print(f"ipsdta full step: {full:.2f} ms/iter ({1e3/full:.1f} it/s)")

    # time the step with a 1-basis model to split off basis-update cost
    Tb1 = T_parts[0][:, :, :1]
    V1 = V0[:, :1]

    def _step1(c):
        Wn, Tn, Vn = sc.ipsdta_vcd_step_sc(Xs, c[0], (c[1],), c[2])
        return (Wn, Tn[0], Vn)

    k1 = chain(_step1, (W, Tb1, V1), lambda c: c[0])
    print(f"ipsdta K=1 step: {k1:.2f} ms/iter (basis/activation share ~= {full-k1:.2f} ms)")


def profile_mnmf():
    import jax
    import jax.numpy as jnp

    from ssspy_tpu.ops import splitc as sc

    rng = np.random.default_rng(0)
    M, I, T, K = 8, 257, 627, 8
    Xc = rng.standard_normal((M, I, T)) + 1j * rng.standard_normal((M, I, T))
    Xs = jnp.asarray(np.stack([Xc.real, Xc.imag]).astype(np.float32))
    XXs = jax.device_put(np.asarray(sc.instant_covariance_sc(Xs)))
    Tm = jax.device_put((rng.random((M, I, K)) + 0.1).astype(np.float32))
    Vm = jax.device_put((rng.random((M, K, T)) + 0.1).astype(np.float32))
    Hm = np.tile(np.eye(M, dtype=np.float32), (M, I, 1, 1)) + np.float32(0.1)
    Hs = jax.device_put(np.stack([Hm, np.zeros_like(Hm)]))

    full = chain(
        lambda c: sc.gauss_mnmf_step_sc(XXs, *c),
        (Tm, Vm, Hs),
        lambda c: c[0],
    )
    print(f"mnmf full step: {full:.2f} ms/iter ({1e3/full:.1f} it/s)")

    from ssspy_tpu.ops.pallas_kernels import prepare_xx_lanes

    lanes = jax.device_put(
        tuple(np.asarray(a) for a in prepare_xx_lanes(XXs[0], XXs[1]))
    )
    hoisted = chain(
        lambda c: sc.gauss_mnmf_step_sc(XXs, *c, XX_lanes=lanes),
        (Tm, Vm, Hs),
        lambda c: c[0],
    )
    print(f"mnmf step, hoisted lanes: {hoisted:.2f} ms/iter ({1e3/hoisted:.1f} it/s)")

    unfused = chain(
        lambda c: sc.gauss_mnmf_step_sc(XXs, *c, fuse="off"),
        (Tm, Vm, Hs),
        lambda c: c[0],
    )
    print(f"mnmf step, fuse=off: {unfused:.2f} ms/iter ({1e3/unfused:.1f} it/s)")

    # fused kernel standalone (data-dependent chaining through T)
    from ssspy_tpu.ops.pallas_kernels import planar_model_traces_sc

    def ktrace_step(c):
        (T_,) = c
        Lamb = T_ @ Vm
        t1, t2, Pr, Pi, Qr, Qi = planar_model_traces_sc(
            Lamb, Hs[0], Hs[1], XXs[0], XXs[1], eps=1e-10, impl="pallas",
            xx_lanes=lanes,
        )
        return (T_ + 0.0 * (t1.sum() + t2.sum() + Pr.sum() + Qr.sum()),)

    kt = chain(ktrace_step, (Tm,), lambda c: c[0], n=30)
    print(f"fused kernel standalone: {kt:.2f} ms/call (x3 per iter = {3*kt:.2f} ms)")

    # spatial tail standalone: HQH congruence + ridge projections + gmean
    def spatial_tail(c):
        Pr_, Pi_ = c
        HQHr, HQHi = sc._cmatmul(*sc._cmatmul(Hs[0], Hs[1], Pr_, Pi_), Hs[0], Hs[1])
        Pr2, Pi2 = sc._psd_project_sc(Pr_, Pi_, 1e-10, "ridge")
        HQHr, HQHi = sc._psd_project_sc(HQHr, HQHi, 1e-10, "ridge")
        Gr, Gi = sc.gmean2_sc(Pr2, Pi2, HQHr, HQHi, impl="chol")
        Gr, Gi = sc._psd_project_sc(Gr, Gi, 1e-10, "ridge")
        return (Pr_ + 0.0 * Gr, Pi_ + 0.0 * Gi)

    P0 = (Hs[0] + 0.3 * np.eye(M, dtype=np.float32), Hs[1])
    st = chain(spatial_tail, P0, lambda c: c[0], n=30)
    print(f"spatial tail standalone: {st:.2f} ms/iter")

    def gmean_only(c):
        Pr_, Pi_ = c
        Gr, Gi = sc.gmean2_sc(Pr_, Pi_, Hs[0], Hs[1], impl="chol")
        return (Pr_ + 0.0 * Gr, Pi_ + 0.0 * Gi)

    gm = chain(gmean_only, P0, lambda c: c[0], n=30)
    print(f"gmean chol standalone: {gm:.2f} ms/call")

    # T/V multiplicative-update tail (einsums on the trace outputs)
    num0 = jax.device_put((rng.random((M, I, T)) + 0.1).astype(np.float32))

    def tv_tail(c):
        (T_,) = c
        n_ = jnp.einsum("nkt,nit->nik", Vm, num0)
        d_ = jnp.einsum("nkt,nit->nik", Vm, num0 + 0.1)
        T2 = jnp.maximum(T_ * jnp.sqrt(n_ / d_), 1e-10)
        n2 = jnp.einsum("nik,nit->nkt", T2, num0)
        d2 = jnp.einsum("nik,nit->nkt", T2, num0 + 0.1)
        V2 = jnp.maximum(Vm * jnp.sqrt(n2 / d2), 1e-10)
        Lamb = T2 @ V2
        return (T2 + 0.0 * Lamb[:, :, :K],)

    tv = chain(tv_tail, (Tm,), lambda c: c[0], n=30)
    print(f"T/V einsum tail standalone: {tv:.2f} ms/iter")

    # stage: one traces() pass == model + inv_sandwich + 2 trace einsums.
    # Approximate by timing the step with normalization off vs on, and
    # the sandwich kernel standalone:
    from ssspy_tpu.ops.pallas_kernels import planar_inv_sandwich_sc

    Rr = jnp.asarray(XXs[0] + 1e-2 * np.eye(M, dtype=np.float32))
    Ri = jnp.asarray(XXs[1])

    def sandwich_step(c):
        o = planar_inv_sandwich_sc(c[0], c[1], XXs[0], XXs[1])
        # data-dependent chaining: feed a scaled output back
        return (c[0] + 0.0 * o[0], c[1])

    sw = chain(sandwich_step, (Rr, Ri), lambda c: c[0], n=10)
    print(f"inv_sandwich standalone: {sw:.2f} ms/call (x3 per iter = {3*sw:.2f} ms)")

    # model reconstruction einsum standalone
    def model_step(c):
        T_, = c
        Lamb = T_ @ Vm
        Rr = jnp.einsum("nit,nipq->itpq", Lamb, Hs[0])
        Ri = jnp.einsum("nit,nipq->itpq", Lamb, Hs[1])
        return (T_ + 0.0 * jnp.einsum("itpq->i", Rr)[:, None] + 0.0 * Ri.sum(),)

    md = chain(model_step, (Tm,), lambda c: c[0], n=10)
    print(f"model einsum standalone: {md:.2f} ms/call (x3 per iter = {3*md:.2f} ms)")


if __name__ == "__main__":
    targets = sys.argv[1:] or ["ipsdta", "mnmf"]
    if "ipsdta" in targets:
        profile_ipsdta()
    if "mnmf" in targets:
        profile_mnmf()
