"""Benchmark the split-complex fast paths on the real TPU chip.

Workload matches BASELINE.md: 16 kHz, 10 s, 8 channels, STFT n_fft=512
hop=256 (257 bins x 627 frames), 100 iterations per timed call, 3 chained
calls with a final host readback (the only trustworthy completion barrier
on remote-execution backends).

Usage: python scripts/tpu_bench.py <variant> [<variant> ...] [--out f.json]
Variants: auxiva_ip1 auxiva_ip1_bf16 auxiva_ip2 auxiva_iss1 auxiva_iss2
          auxiva_ipa ilrma_ip1 ilrma_ip2 ilrma_iss1 ilrma_iss2 ilrma_ipa
          fdica_ip1 fdica_ip2 mnmf cacgmm hva wave_e2e bf16_loss
          grad_iva natural_grad_iva grad_fdica natural_grad_fdica
          fast_iva faster_iva pds_iva admm_iva t_ilrma_ip1 ggd_ilrma_ip1 ipsdta mnmf_dense
          ica_grad ica_natural_grad ica_fast
Existing entries in the output JSON are preserved (merge-on-write).
"""

import functools
import json
import os
import sys
import time

import numpy as np

# 300-iteration measurement chunks: the remote backend's ~8 ms
# per-execution overhead inflates 100-iteration timings of sub-ms steps
# by 10-30% (flagship: 2985 it/s at n=100 vs 4094 at n=300)
N_ITER = 300
REPS = 3


def make_spectrogram():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    mix = bench.make_mixture()
    return bench.host_stft(mix), mix


def _time_scan(step_with_carry, carry, read_leaf, n_iter=None):
    """Compile + time REPS chained n-iter scans; return iters/sec.

    Delegates to ``bench._chain_scan`` — ONE copy of the load-bearing
    timing methodology (chained data-dependent executions, measurement
    chunk size, host-readback barrier) shared with the driver metric.
    ``n_iter`` overrides the standard chunk for steps so fast that the
    tunnel's ~3 ms per-call round trip would dominate (the time-domain
    ICA rows: ~17 us/step).
    """
    import bench

    return bench._chain_scan(
        step_with_carry,
        carry,
        read_leaf,
        n_iter=N_ITER if n_iter is None else n_iter,
        reps=REPS,
    )


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = "/tmp/tpu_bench.json"
    for i, a in enumerate(sys.argv[1:]):
        if a == "--out":
            out_path = sys.argv[1:][i + 1]

    import jax

    from ssspy_tpu.ops import splitc as sc

    spec, mix = make_spectrogram()
    M, I, T = spec.shape
    K = 8
    rng = np.random.default_rng(0)

    Xs = jax.device_put(np.stack([spec.real, spec.imag]).astype(np.float32))
    W0 = np.zeros((2, I, M, M), dtype=np.float32)
    W0[0] = np.eye(M, dtype=np.float32)
    Wd = jax.device_put(W0)
    Tb = jax.device_put((rng.random((M, I, K)) + 0.1).astype(np.float32))
    Vb = jax.device_put((rng.random((M, K, T)) + 0.1).astype(np.float32))
    Db = jax.device_put((rng.random((I, M, M)) + 0.1).astype(np.float32))

    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)

    def record(name, fn):
        if name not in args:
            return
        try:
            t0 = time.perf_counter()
            value = fn()
            results[name] = value
            if isinstance(value, dict):  # _rate_stats row: median + spread
                print(
                    f"{name}: {value['median']:.3f} "
                    f"[{value['min']:.3f}, {value['max']:.3f}] "
                    f"(total {time.perf_counter()-t0:.0f}s)",
                    flush=True,
                )
            else:
                results[name] = round(value, 3)
                print(
                    f"{name}: {value:.3f} (total {time.perf_counter()-t0:.0f}s)",
                    flush=True,
                )
        except Exception as exc:
            results[name] = {"error": repr(exc)[:300]}
            print(f"{name}: FAILED {exc!r}", flush=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    record("auxiva_ip1", lambda: _time_scan(lambda w: sc.auxiva_ip1_step_sc(Xs, w), Wd, lambda c: c))
    record(
        "auxiva_ip1_bf16",
        lambda: _time_scan(
            lambda w: sc.auxiva_ip1_step_sc(Xs, w, covariance_impl="pallas_bf16"),
            Wd,
            lambda c: c,
        ),
    )
    record("auxiva_ip2", lambda: _time_scan(lambda w: sc.auxiva_ip2_step_sc(Xs, w), Wd, lambda c: c))
    record("auxiva_iss1", lambda: _time_scan(sc.auxiva_iss1_step_sc, Xs, lambda c: c))
    record("auxiva_iss2", lambda: _time_scan(sc.auxiva_iss2_step_sc, Xs, lambda c: c))
    record("auxiva_ipa", lambda: _time_scan(sc.auxiva_ipa_step_sc, Xs, lambda c: c))
    record(
        "ilrma_ip1",
        lambda: _time_scan(
            lambda c: sc.gauss_ilrma_ip1_step_sc(Xs, *c), (Wd, Tb, Vb), lambda c: c[0]
        ),
    )
    record(
        "ilrma_ip2",
        lambda: _time_scan(
            lambda c: sc.gauss_ilrma_ip2_step_sc(Xs, *c), (Wd, Tb, Vb), lambda c: c[0]
        ),
    )
    record(
        "ilrma_iss1",
        lambda: _time_scan(
            lambda c: sc.gauss_ilrma_iss1_step_sc(*c), (Xs, Tb, Vb), lambda c: c[0]
        ),
    )
    record(
        "ilrma_iss2",
        lambda: _time_scan(
            lambda c: sc.gauss_ilrma_iss2_step_sc(*c), (Xs, Tb, Vb), lambda c: c[0]
        ),
    )
    record(
        "ilrma_ipa",
        lambda: _time_scan(
            lambda c: sc.gauss_ilrma_ipa_step_sc(*c), (Xs, Tb, Vb), lambda c: c[0]
        ),
    )
    record(
        "fdica_ip1",
        lambda: _time_scan(lambda w: sc.aux_laplace_fdica_ip1_step_sc(Xs, w), Wd, lambda c: c),
    )
    record(
        "fdica_ip2",
        lambda: _time_scan(lambda w: sc.aux_laplace_fdica_ip2_step_sc(Xs, w), Wd, lambda c: c),
    )
    record(
        "mnmf",
        lambda: _time_scan(
            lambda c: sc.fast_gauss_mnmf_step_sc(Xs, *c),
            (Wd, Tb, Vb, Db),
            lambda c: c[0],
        ),
    )

    record(
        "grad_iva",
        lambda: _time_scan(lambda w: sc.grad_laplace_iva_step_sc(Xs, w), Wd, lambda c: c),
    )
    record(
        "natural_grad_iva",
        lambda: _time_scan(
            lambda w: sc.grad_laplace_iva_step_sc(Xs, w, natural=True), Wd, lambda c: c
        ),
    )
    record(
        "grad_fdica",
        lambda: _time_scan(lambda w: sc.grad_laplace_fdica_step_sc(Xs, w), Wd, lambda c: c),
    )
    record(
        "natural_grad_fdica",
        lambda: _time_scan(
            lambda w: sc.grad_laplace_fdica_step_sc(Xs, w, natural=True), Wd, lambda c: c
        ),
    )

    def fixed_point(variant):
        import jax.numpy as jnp

        Zs = jax.jit(sc.whiten_sc)(Xs)
        np.asarray(Zs)
        step = sc.fast_iva_step_sc if variant == "fast" else sc.faster_iva_step_sc
        return _time_scan(lambda w: step(Zs, w), Wd, lambda c: c)

    record("fast_iva", lambda: fixed_point("fast"))
    record("faster_iva", lambda: fixed_point("faster"))

    def pds_iva():
        Y0 = jax.device_put(np.zeros((2, M, I, T), dtype=np.float32))
        return _time_scan(
            lambda c: sc.pds_iva_step_sc(Xs, *c), (Wd, Y0), lambda c: c[0]
        )

    record("pds_iva", pds_iva)

    def admm_iva():
        zf = jax.device_put(np.zeros((2, I, M, M), dtype=np.float32))
        zs = jax.device_put(np.zeros((2, M, I, T), dtype=np.float32))
        # loop-invariant quadratic inverse, hoisted like fast_admm_iva
        quad = jax.jit(sc.admm_quad_inv_sc)(Xs)

        def step(c):
            _, V, Vt, Y, Yt = sc.admm_iva_step_sc(Xs, *c, quad_inv=quad)
            return (V, Vt, Y, Yt)

        return _time_scan(step, (zf, zs, zf, zs), lambda c: c[0])

    record("admm_iva", admm_iva)
    record(
        "t_ilrma_ip1",
        lambda: _time_scan(
            lambda c: sc.ilrma_ip_step_sc(Xs, *c, model="t", dof=5.0),
            (Wd, Tb, Vb),
            lambda c: c[0],
        ),
    )
    record(
        "ggd_ilrma_ip1",
        lambda: _time_scan(
            lambda c: sc.ilrma_ip_step_sc(Xs, *c, model="ggd", shape=1.5),
            (Wd, Tb, Vb),
            lambda c: c[0],
        ),
    )

    def mnmf_dense():
        Hd = np.zeros((2, M, I, M, M), dtype=np.float32)
        Hd[0] = np.eye(M, dtype=np.float32) / M
        XXs = jax.jit(sc.instant_covariance_sc)(Xs)
        np.asarray(XXs)
        return _time_scan(
            lambda c: sc.gauss_mnmf_step_sc(XXs, *c),
            (Tb, Vb, jax.device_put(Hd)),
            lambda c: c[0],
        )

    record("mnmf_dense", mnmf_dense)

    def ipsdta():
        n_blocks = 64
        n_remains = I % n_blocks  # 257 bins -> (63, 4) + (1, 5)
        J = I // n_blocks
        shapes = [(n_blocks - n_remains, J)] + ([(n_remains, J + 1)] if n_remains else [])
        parts = []
        for B, Jp in shapes:
            Tp = np.zeros((2, M, K, B, Jp, Jp), dtype=np.float32)
            Tp[0] = rng.random((M, K, B, Jp))[..., None].astype(np.float32) * np.eye(
                Jp, dtype=np.float32
            )
            parts.append(jax.device_put(Tp))

        def step(c):
            W, ps, V = sc.gauss_ipsdta_vcd_step_sc(Xs, c[0], list(c[1]), c[2])
            return (W, tuple(ps), V)

        return _time_scan(step, (Wd, tuple(parts), Vb), lambda c: c[0])

    record("ipsdta", ipsdta)

    def cacgmm():
        Z = spec / np.maximum(np.abs(np.linalg.norm(spec, axis=0)), 1e-10)
        Zs = jax.device_put(np.stack([Z.real, Z.imag]).astype(np.float32))
        alpha0 = rng.random((M, I))
        alpha0 = (alpha0 / alpha0.sum(axis=0)).astype(np.float32)
        Bd = rng.random((M, I, M))
        Bd = Bd / Bd.sum(axis=-1, keepdims=True)
        B0 = (Bd[:, :, :, None] * np.eye(M)).astype(np.float32)
        carry = (jax.device_put(alpha0), jax.device_put(np.stack([B0, np.zeros_like(B0)])))
        return _time_scan(
            lambda c: sc.cacgmm_step_sc(Zs, *c), carry, lambda c: c[0]
        )

    record("cacgmm", cacgmm)

    def hva():
        Y0 = jax.device_put(np.zeros((2, M, I, T), dtype=np.float32))
        return _time_scan(
            lambda c: sc.hva_pds_step_sc(Xs, *c), (Wd, Y0), lambda c: c[0]
        )

    record("hva", hva)

    def ica_family(variant):
        # BASELINE config #1: time-domain 2-source instantaneous mixture,
        # real f32 — the one family whose class API runs directly on the
        # axon chip (no complex dtypes anywhere)
        import jax.numpy as jnp

        rng2 = np.random.default_rng(3)
        s = rng2.laplace(size=(2, 160_000)).astype(np.float32)
        A = rng2.standard_normal((2, 2)).astype(np.float32)
        x = jax.device_put(A @ s)

        if variant == "fast":
            from ssspy_tpu.bss.ica import FastICA

            m = FastICA(
                contrast_fn=lambda y: jnp.abs(y),
                score_fn=jnp.tanh,
                d_score_fn=lambda y: 1 - jnp.tanh(y) ** 2,
                record_loss=False,
            )
        else:
            from ssspy_tpu.bss.ica import GradLaplaceICA, NaturalGradLaplaceICA

            cls = NaturalGradLaplaceICA if variant == "natural" else GradLaplaceICA
            m = cls(step_size=0.1, record_loss=False)
        m.input = x
        m._reset()
        state = m.init_state()
        step = m.make_step()
        return _time_scan(step, state, lambda c: c["W"], n_iter=1000)

    record("ica_grad", lambda: ica_family("grad"))
    record("ica_natural_grad", lambda: ica_family("natural"))
    record("ica_fast", lambda: ica_family("fast"))

    def wave_e2e():
        from ssspy_tpu.fast import fast_auxiva_wave

        x = mix.astype(np.float32)
        fast_auxiva_wave(x, n_iter=N_ITER)  # compile + run
        t0 = time.perf_counter()
        for _ in range(REPS):
            y = fast_auxiva_wave(x, n_iter=N_ITER)
        dt = (time.perf_counter() - t0) / REPS
        assert np.all(np.isfinite(y))
        return N_ITER / dt

    record("wave_e2e", wave_e2e)

    def bf16_loss():
        """Converged AuxIVA loss: f32 covariance vs bf16 covariance."""
        import jax.numpy as jnp
        from jax import lax

        def loss_of(impl):
            @functools.partial(jax.jit, static_argnums=(1,))
            def runner(w, n):
                def body(w, _):
                    return sc.auxiva_ip1_step_sc(Xs, w, covariance_impl=impl), None

                return lax.scan(body, w, None, length=n)[0]

            Wn = runner(Wd, N_ITER)
            # AuxIVA loss: sum_t mean contrast - 2 log|det W|
            Wr, Wi = Wn[0], Wn[1]
            Yr = jnp.einsum("inm,mit->nit", Wr, Xs[0]) - jnp.einsum(
                "inm,mit->nit", Wi, Xs[1]
            )
            Yi = jnp.einsum("inm,mit->nit", Wr, Xs[1]) + jnp.einsum(
                "inm,mit->nit", Wi, Xs[0]
            )
            contrast = 2 * jnp.sqrt(jnp.sum(Yr**2 + Yi**2, axis=1))
            W2 = sc.block_embed(Wr, Wi)
            logdet = jnp.linalg.slogdet(W2)[1] / 2
            return float(jnp.sum(jnp.mean(contrast, axis=-1)) - 2 * jnp.sum(logdet))

        f32 = loss_of("pallas")
        bf16 = loss_of("pallas_bf16")
        results["bf16_loss_f32"] = round(f32, 4)
        results["bf16_loss_bf16"] = round(bf16, 4)
        return bf16 - f32

    record("bf16_loss", bf16_loss)

    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
