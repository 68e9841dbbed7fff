"""Stage-level decomposition of the IPA sweep on the current backend.

VERDICT r3 item #1: the two IPA rows (AuxIVA-IPA 160.6 it/s,
GaussILRMA-IPA 106.8) are the slowest family-relative rows and have no
committed post-secular profile. This times each stage of one source's
update — covariance stats, ridged inverse, LQPQM prep, shift-invert
phi_max estimate, secular resolvent trips, final resolvent solve,
rank-1 Y update — as its own chained-scan program (methodology of
scripts/tpu_roofline.py: chained data-dependent executions + host
readback barrier), at the BASELINE shapes (M=8, I=257, T=627, f32).

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_ipa_profile.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain(step, carry, read_leaf, n=60, reps=3):
    import jax
    from jax import lax

    @functools.partial(jax.jit, static_argnums=1)
    def runner(c, k):
        return lax.scan(lambda c, _: (step(c), None), c, None, length=k)[0]

    np.asarray(read_leaf(runner(carry, n)))  # compile + warm
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

    eps = 1e-10
    rel = 1e-6

    spec = bench.host_stft(bench.make_mixture())
    M, I, T = spec.shape
    Ys = jax.device_put(
        np.stack([spec.real, spec.imag]).astype(np.float32)
    )  # (2, M, I, T)
    print(f"shapes: M={M} I={I} T={T}", flush=True)

    # realistic iterate: a few full IPA steps first
    warm = jax.jit(
        lambda Y: sc.auxiva_ipa_step_sc(
            sc.auxiva_ipa_step_sc(Y, eps=eps), eps=eps
        )
    )
    Ys = warm(Ys)
    Yr, Yi = Ys[0], Ys[1]
    n_frames = T
    n_sources = M

    results = {}

    def rec(name, ms):
        results[name] = ms
        print(f"{name:24s} {ms:8.3f} ms", flush=True)

    # ---- full step -----------------------------------------------------
    step_full = lambda Y: sc.auxiva_ipa_step_sc(Y, eps=eps)
    rec("full_step", chain(step_full, Ys, lambda c: c, n=60))

    # ---- stage operands for source n=0 (tikhonov path, mirrors
    # ipa_sweep_sc lines; recomputed on device inside each stage fn) ----
    norm = jnp.sqrt(jnp.sum(Yr**2 + Yi**2, axis=1))
    varphi = 1.0 / jnp.maximum(norm, eps)  # (N, T)
    n = 0
    oth = tuple(k for k in range(n_sources) if k != n)

    def cov_stats(Y):
        """Covariance + scalar stats for ONE source (tikhonov path)."""
        Yr, Yi = Y[0], Y[1]
        norm = jnp.sqrt(jnp.sum(Yr**2 + Yi**2, axis=1))
        varphi = 1.0 / jnp.maximum(norm, eps)
        vp_n = varphi[n]
        Un_r = (
            jnp.einsum("t,ait,bit->iab", vp_n, Yr, Yr)
            + jnp.einsum("t,ait,bit->iab", vp_n, Yi, Yi)
        ) / n_frames
        Un_i = (
            jnp.einsum("t,ait,bit->iab", vp_n, Yi, Yr)
            - jnp.einsum("t,ait,bit->iab", vp_n, Yr, Yi)
        ) / n_frames
        Un_r = (Un_r + jnp.swapaxes(Un_r, -1, -2)) / 2
        Un_i = (Un_i - jnp.swapaxes(Un_i, -1, -2)) / 2
        sumY2 = jnp.sum(Yr**2 + Yi**2, axis=0)
        lam = eps + rel * jnp.einsum("st,it->is", varphi, sumY2) / (
            n_frames * n_sources
        )
        Y2n = Yr[n] ** 2 + Yi[n] ** 2
        a_all = jnp.einsum("st,it->is", varphi, Y2n) / n_frames + lam
        prod_r = Yr[n][None] * Yr + Yi[n][None] * Yi
        prod_i = Yi[n][None] * Yr - Yr[n][None] * Yi
        b_all_r = jnp.einsum("st,sit->is", varphi, prod_r) / n_frames
        b_all_i = jnp.einsum("st,sit->is", varphi, prod_i) / n_frames
        eye = jnp.eye(n_sources, dtype=Yr.dtype)
        Un_r = Un_r + lam[:, n, None, None] * eye
        return Un_r, Un_i, a_all, b_all_r, b_all_i, lam

    Un_r, Un_i, a_all, b_all_r, b_all_i, lam = jax.jit(cov_stats)(Ys)

    def stage_cov(Y):
        outs = cov_stats(Y)
        # data-dependent feedback at negligible magnitude
        return Y + 1e-12 * outs[0][0, 0, 0]

    rec("cov_stats(x1 src)", chain(stage_cov, Ys, lambda c: c, n=60))

    def stage_inv(carry):
        Ur, Ui = carry
        E = jnp.broadcast_to(jnp.eye(n_sources, dtype=Ur.dtype), Ur.shape)
        Vr, Vi = sc.csolve_matrix(Ur, Ui, E, jnp.zeros_like(E))
        return Ur + 1e-12 * Vr[0, 0, 0], Ui

    rec("ridged_inv(x1 src)", chain(stage_inv, (Un_r, Un_i), lambda c: c[0], n=60))

    # prep: C/d extraction + csolve + H/v/z assembly (sweep lines 1726-1750)
    E = jnp.broadcast_to(jnp.eye(n_sources, dtype=Un_r.dtype), Un_r.shape)
    Vr0, Vi0 = jax.jit(lambda a, b: sc.csolve_matrix(a, b, E, jnp.zeros_like(E)))(
        Un_r, Un_i
    )

    def prep(Vr, Vi):
        a_n = jnp.stack([a_all[:, s] for s in oth], axis=-1)
        b_r = jnp.stack([b_all_r[:, s] for s in oth], axis=-1)
        b_i = jnp.stack([b_all_i[:, s] for s in oth], axis=-1)
        Cr = jnp.stack(
            [jnp.stack([Vr[:, s, t] for t in oth], axis=-1) for s in oth], axis=-2
        )
        Ci = -jnp.stack(
            [jnp.stack([Vi[:, s, t] for t in oth], axis=-1) for s in oth], axis=-2
        )
        dr = jnp.stack([Vr[:, s, n] for s in oth], axis=-1)
        di = -jnp.stack([Vi[:, s, n] for s in oth], axis=-1)
        Cd_r, Cd_i = sc.csolve(Cr, Ci, dr, di)
        dCd = jnp.sum(dr * Cd_r + di * Cd_i, axis=-1)
        z_n = Vr[:, n, n] - dCd
        a_sqrt = jnp.sqrt(a_n)
        aa = a_sqrt[:, :, None] * a_sqrt[:, None, :]
        Hr, Hi = Cr / aa, Ci / aa
        v_r = -b_r / a_sqrt - a_sqrt * Cd_r
        v_i = -b_i / a_sqrt - a_sqrt * Cd_i
        trace = jnp.sum(jnp.diagonal(Hr, axis1=-2, axis2=-1), axis=-1)
        return (
            Hr / trace[..., None, None],
            Hi / trace[..., None, None],
            v_r,
            v_i,
            z_n / trace,
            a_sqrt,
            a_n,
            b_r,
            b_i,
        )

    Hr, Hi, v_r, v_i, z_n, a_sqrt, a_n, b_r, b_i = jax.jit(prep)(Vr0, Vi0)

    def stage_prep(carry):
        Vr, Vi = carry
        outs = prep(Vr, Vi)
        return Vr + 1e-12 * outs[0][0, 0, 0], Vi

    rec("lqpqm_prep(x1 src)", chain(stage_prep, (Vr0, Vi0), lambda c: c[0], n=60))

    def stage_shiftinv(carry):
        Hr, Hi = carry
        tr, ti = sc._top_eigvec_shift_invert_sc(Hr, Hi, bisect_trips=8)
        return Hr + 1e-12 * tr[..., 0, None, None] * 0 + 1e-12 * tr[0, 0], Hi

    rec("shift_invert(x1 src)", chain(stage_shiftinv, (Hr, Hi), lambda c: c[0], n=60))

    def stage_secular(carry):
        Hr, Hi, z = carry
        mu, _ = sc._secular_root_solve_sc(Hr, Hi, v_r, v_i, z, trips=12)
        return Hr, Hi, z + 1e-12 * mu

    rec(
        "secular_solve(x1 src)",
        chain(stage_secular, (Hr, Hi, z_n), lambda c: c[2], n=60),
    )

    def stage_lqpqm(carry):
        Hr, Hi, z = carry
        qr, qi = sc.lqpqm2_sc(Hr, Hi, v_r, v_i, z, eps=eps, secular_impl="solve")
        return Hr, Hi, z + 1e-12 * qr[..., 0]

    rec("lqpqm_full(x1 src)", chain(stage_lqpqm, (Hr, Hi, z_n), lambda c: c[2], n=60))

    qc_r, qc_i = jax.jit(
        lambda a, b, c: sc.lqpqm2_sc(a, b, v_r, v_i, c, eps=eps, secular_impl="solve")
    )(Hr, Hi, z_n)

    def yupdate(Y, qc_r, qc_i):
        Yr, Yi = Y[0], Y[1]
        q_r = qc_r / a_sqrt - b_r / a_n
        q_i = qc_i / a_sqrt - b_i / a_n
        n_bins = Yr.shape[1]
        one = jnp.ones((n_bins,), Yr.dtype)
        zero = jnp.zeros((n_bins,), Yr.dtype)
        cols_r, cols_i = [], []
        k = 0
        for s in range(n_sources):
            if s == n:
                cols_r.append(one)
                cols_i.append(zero)
            else:
                cols_r.append(-q_r[:, k])
                cols_i.append(q_i[:, k])
                k += 1
        qt_r = jnp.stack(cols_r, axis=-1)
        qt_i = jnp.stack(cols_i, axis=-1)
        Uq_r, Uq_i = sc.csolve(Un_r, Un_i, qt_r, qt_i)
        qUq = jnp.sum(qt_r * Uq_r + qt_i * Uq_i, axis=-1)
        denom = jnp.maximum(jnp.sqrt(jnp.maximum(qUq, 0.0)), eps)[:, None]
        p_r = Uq_r / denom
        p_i = Uq_i / denom
        PY_r = jnp.einsum("is,sit->it", p_r, Yr) + jnp.einsum("is,sit->it", p_i, Yi)
        PY_i = jnp.einsum("is,sit->it", p_r, Yi) - jnp.einsum("is,sit->it", p_i, Yr)
        Ynr, Yni = Yr[n], Yi[n]
        qf_r = jnp.stack(
            [zero if s == n else q_r[:, oth.index(s)] for s in range(n_sources)],
            axis=0,
        )
        qf_i = jnp.stack(
            [zero if s == n else q_i[:, oth.index(s)] for s in range(n_sources)],
            axis=0,
        )
        Yr = Yr + (qf_r[:, :, None] * Ynr[None] + qf_i[:, :, None] * Yni[None])
        Yi = Yi + (qf_r[:, :, None] * Yni[None] - qf_i[:, :, None] * Ynr[None])
        Yr = Yr.at[n].set(PY_r)
        Yi = Yi.at[n].set(PY_i)
        return jnp.stack([Yr, Yi], axis=0)

    def stage_yupdate(Y):
        out = yupdate(Y, qc_r, qc_i)
        return Y + 1e-12 * out[0, 0, 0, 0]

    rec("y_update(x1 src)", chain(stage_yupdate, Ys, lambda c: c, n=60))

    per_src = (
        results["cov_stats(x1 src)"]
        + results["ridged_inv(x1 src)"]
        + results["lqpqm_prep(x1 src)"]
        + results["lqpqm_full(x1 src)"]
        + results["y_update(x1 src)"]
    )
    print(f"\nsum(stages) x {n_sources} = {per_src * n_sources:.3f} ms "
          f"vs full_step {results['full_step']:.3f} ms", flush=True)
    print(
        "secular trips portion per src = "
        f"{results['secular_solve(x1 src)'] - results['shift_invert(x1 src)']:.3f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
