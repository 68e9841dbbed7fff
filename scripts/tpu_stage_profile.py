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


def profile_ipa():
    """Stage decomposition of the post-secular IPA sweep (AuxIVA-IPA).

    The sweep (ops/splitc.py ipa_sweep_sc, tikhonov + solve impls) loops
    over N sources; per source the stages are (1) the varphi-weighted
    covariance einsums, (2) the ridged planar inverse of U_n, (3) the
    LQPQM reduction incl. the resolvent-secular solve, (4) the solve +
    rank-1 Y-update tail. Each stage is timed standalone as its own
    chained-scan program at the per-source shapes; multiply by N=8 to
    compare against the full step.
    """
    import jax
    import jax.numpy as jnp

    from ssspy_tpu.ops import splitc as sc

    rng = np.random.default_rng(0)
    N, I, T = 8, 257, 627
    Y0 = rng.standard_normal((2, N, I, T)).astype(np.float32)
    Ys = jax.device_put(jnp.asarray(Y0))

    full = chain(lambda c: sc.auxiva_ipa_step_sc(c), Ys, lambda c: c)
    print(f"ipa full step: {full:.2f} ms/iter ({1e3/full:.1f} it/s)")

    # stage 1: covariance einsums for ONE source (x8 per sweep)
    def cov_stage(c):
        Yr, Yi = c[0], c[1]
        norm = jnp.sqrt(jnp.sum(Yr**2 + Yi**2, axis=1))
        varphi = 1.0 / jnp.maximum(norm, 1e-10)
        vp = varphi[0]
        Un_r = (
            jnp.einsum("t,ait,bit->iab", vp, Yr, Yr)
            + jnp.einsum("t,ait,bit->iab", vp, Yi, Yi)
        ) / T
        Un_i = (
            jnp.einsum("t,ait,bit->iab", vp, Yi, Yr)
            - jnp.einsum("t,ait,bit->iab", vp, Yr, Yi)
        ) / T
        sumY2 = jnp.sum(Yr**2 + Yi**2, axis=0)
        lam = jnp.einsum("st,it->is", varphi, sumY2)
        Y2n = Yr[0] ** 2 + Yi[0] ** 2
        a_all = jnp.einsum("st,it->is", varphi, Y2n)
        prod_r = Yr[0][None] * Yr + Yi[0][None] * Yi
        prod_i = Yi[0][None] * Yr - Yr[0][None] * Yi
        b_r = jnp.einsum("st,sit->is", varphi, prod_r)
        b_i = jnp.einsum("st,sit->is", varphi, prod_i)
        pert = 1e-20 * (
            jnp.sum(Un_r) + jnp.sum(Un_i) + jnp.sum(lam)
            + jnp.sum(a_all) + jnp.sum(b_r) + jnp.sum(b_i)
        )
        return c + pert

    cov = chain(cov_stage, Ys, lambda c: c)
    print(f"ipa cov stage (1 source): {cov:.3f} ms  (x8 = {8*cov:.2f} ms)")

    # stage 2: ridged planar inverse of U_n, (I, N, N) -> embedded 2Nx2N GJ
    Uc = rng.standard_normal((I, N, T)) + 1j * rng.standard_normal((I, N, T))
    U = (Uc @ Uc.conj().swapaxes(-1, -2)) / T + 0.1 * np.eye(N)
    Ur0 = jax.device_put(U.real.astype(np.float32))
    Ui0 = jax.device_put(U.imag.astype(np.float32))
    E = jnp.broadcast_to(jnp.eye(N, dtype=jnp.float32), Ur0.shape)

    def inv_stage(c):
        Vr, Vi = sc.csolve_matrix(c[0], c[1], E, jnp.zeros_like(E))
        return (c[0] + 1e-20 * jnp.sum(Vr), c[1] + 1e-20 * jnp.sum(Vi))

    inv = chain(inv_stage, (Ur0, Ui0), lambda c: c[0])
    print(f"ipa inverse stage (1 source): {inv:.3f} ms  (x8 = {8*inv:.2f} ms)")

    # stage 3: LQPQM reduction incl. resolvent-secular solve, (I, N-1)
    K = N - 1
    Hc = rng.standard_normal((I, K, T)) + 1j * rng.standard_normal((I, K, T))
    H = (Hc @ Hc.conj().swapaxes(-1, -2)) / T
    tr = np.trace(H, axis1=-2, axis2=-1).real
    H = H / tr[:, None, None]
    Hr0 = jax.device_put(H.real.astype(np.float32))
    Hi0 = jax.device_put(H.imag.astype(np.float32))
    z0 = jax.device_put((rng.random(I) + 0.5).astype(np.float32))
    vr0 = jax.device_put(rng.standard_normal((I, K)).astype(np.float32))
    vi0 = jax.device_put(rng.standard_normal((I, K)).astype(np.float32))

    def lq_stage(c):
        qr, qi = sc.lqpqm2_sc(
            Hr0, Hi0, c[0], c[1], z0, eps=1e-10, max_iter=1, secular_impl="solve"
        )
        return (c[0] + 1e-20 * jnp.sum(qr), c[1] + 1e-20 * jnp.sum(qi))

    lq = chain(lq_stage, (vr0, vi0), lambda c: c[0])
    print(f"ipa lqpqm stage (1 source): {lq:.3f} ms  (x8 = {8*lq:.2f} ms)")

    # stage 4: the two small csolves + rank-1 Y update tail
    qfr0 = jax.device_put(rng.standard_normal((N, I)).astype(np.float32) * 0.1)
    qfi0 = jax.device_put(rng.standard_normal((N, I)).astype(np.float32) * 0.1)

    def tail_stage(c):
        Yr, Yi = c[0], c[1]
        dr = vr0
        di = vi0
        Cd_r, Cd_i = sc.csolve(Hr0, Hi0, dr, di)
        qt_r = jnp.concatenate([jnp.ones((I, 1), jnp.float32), Cd_r], axis=-1)
        qt_i = jnp.concatenate([jnp.zeros((I, 1), jnp.float32), Cd_i], axis=-1)
        Uq_r, Uq_i = sc.csolve(Ur0, Ui0, qt_r, qt_i)
        qUq = jnp.sum(qt_r * Uq_r + qt_i * Uq_i, axis=-1)
        denom = jnp.maximum(jnp.sqrt(jnp.maximum(qUq, 0.0)), 1e-10)[:, None]
        p_r, p_i = Uq_r / denom, Uq_i / denom
        PY_r = jnp.einsum("is,sit->it", p_r, Yr) + jnp.einsum("is,sit->it", p_i, Yi)
        PY_i = jnp.einsum("is,sit->it", p_r, Yi) - jnp.einsum("is,sit->it", p_i, Yr)
        Ynr, Yni = Yr[0], Yi[0]
        Yr = Yr + (qfr0[:, :, None] * Ynr[None] + qfi0[:, :, None] * Yni[None])
        Yi = Yi + (qfr0[:, :, None] * Yni[None] - qfi0[:, :, None] * Ynr[None])
        Yr = Yr.at[0].set(PY_r)
        Yi = Yi.at[0].set(PY_i)
        return jnp.stack([0.999 * Yr, 0.999 * Yi], axis=0)

    tail = chain(tail_stage, Ys, lambda c: c)
    print(f"ipa Y-tail stage (1 source): {tail:.3f} ms  (x8 = {8*tail:.2f} ms)")


def profile_admm():
    """ADMMIVA vs PDSIVA stage decomposition (VERDICT r3 weak #2)."""
    import jax
    import jax.numpy as jnp

    from ssspy_tpu.ops import splitc as sc

    rng = np.random.default_rng(0)
    M, I, T = 8, 257, 627
    Xc = rng.standard_normal((M, I, T)) + 1j * rng.standard_normal((M, I, T))
    Xs = jax.device_put(jnp.asarray(np.stack([Xc.real, Xc.imag]).astype(np.float32)))
    zf = jnp.zeros((2, I, M, M), jnp.float32)
    zs = jnp.zeros((2, M, I, T), jnp.float32)

    def admm_step(c):
        _, V, Vt, Y, Yt = sc.admm_iva_step_sc(Xs, c[0], c[1], c[2], c[3])
        return (V, Vt, Y, Yt)

    full = chain(admm_step, (zf, zs, zf, zs), lambda c: c[0])
    print(f"admm full step: {full:.2f} ms/iter ({1e3/full:.1f} it/s)")

    def pds_step(c):
        W, Y = sc.pds_iva_step_sc(Xs, c[0], c[1])
        return (W, Y)

    pds = chain(pds_step, (zf, zs), lambda c: c[0])
    print(f"pds full step: {pds:.2f} ms/iter ({1e3/pds:.1f} it/s)")

    # stage: the per-iteration XX einsum + (XX+I) solve (both constant in X!)
    def xx_solve_stage(c):
        Xr, Xi = Xs[0], Xs[1]
        XXr = jnp.einsum("mit,pit->imp", Xr, Xr) + jnp.einsum("mit,pit->imp", Xi, Xi)
        XXi = jnp.einsum("mit,pit->imp", Xr, Xi) - jnp.einsum("mit,pit->imp", Xi, Xr)
        E = jnp.eye(M, dtype=jnp.float32)
        Wr, Wi = sc.csolve_matrix(XXr + E, XXi, c[0][0], c[0][1])
        return ((c[0][0] + 1e-20 * jnp.sum(Wr), c[0][1] + 1e-20 * jnp.sum(Wi)),)

    B0 = (jnp.asarray(rng.standard_normal((I, M, M)).astype(np.float32)),
          jnp.asarray(rng.standard_normal((I, M, M)).astype(np.float32)))
    xxs = chain(xx_solve_stage, (B0,), lambda c: c[0][0])
    print(f"admm XX+solve stage: {xxs:.3f} ms/iter")

    # stage: prox_neg_logdet with vs without the null lift (ADMM needs lift)
    G0 = (jnp.asarray((rng.standard_normal((I, M, M)) * 0.3).astype(np.float32)),
          jnp.asarray((rng.standard_normal((I, M, M)) * 0.3).astype(np.float32)))

    def prox_stage(lift):
        def f(c):
            Wr, Wi = sc.prox_neg_logdet_sc(c[0], c[1], lift_null=lift)
            return (0.5 * c[0] + 0.5 * Wr, 0.5 * c[1] + 0.5 * Wi)
        return f

    p_lift = chain(prox_stage(True), G0, lambda c: c[0])
    p_noli = chain(prox_stage(False), G0, lambda c: c[0])
    print(f"prox_neg_logdet lift_null=True: {p_lift:.3f} ms  False: {p_noli:.3f} ms")

    # stage: the XVY einsums + _csep (per-iteration intrinsic)
    def einsum_stage(c):
        Xr, Xi = Xs[0], Xs[1]
        VTr, VTi = c[0], c[1]
        XVYr = jnp.einsum("mit,nit->imn", Xr, VTr) + jnp.einsum("mit,nit->imn", Xi, VTi)
        XVYi = jnp.einsum("mit,nit->imn", Xr, VTi) - jnp.einsum("mit,nit->imn", Xi, VTr)
        XWr, XWi = sc._csep(XVYr, XVYi, Xr, Xi)
        return (0.999 * c[0] + 1e-20 * jnp.sum(XWr), 0.999 * c[1] + 1e-20 * jnp.sum(XWi))

    es = chain(einsum_stage, (zs[0] + 0.1, zs[1]), lambda c: c[0])
    print(f"admm XVY+csep einsum stage: {es:.3f} ms/iter")


if __name__ == "__main__":
    targets = sys.argv[1:] or ["ipsdta", "mnmf"]
    if "ipsdta" in targets:
        profile_ipsdta()
    if "mnmf" in targets:
        profile_mnmf()
    if "ipa" in targets:
        profile_ipa()
    if "admm" in targets:
        profile_admm()
