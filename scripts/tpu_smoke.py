"""Smoke-test every split-complex fast-path kernel on the real TPU chip.

Runs tiny shapes through each jitted step and reports OK/FAIL per kernel
plus a host-readback checksum (the only trustworthy completion barrier on
remote-execution backends). Usage: python scripts/tpu_smoke.py [out.json]
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    results = {"backend": jax.default_backend(), "device": str(jax.devices()[0])}

    rng = np.random.default_rng(0)
    M, I, T, K = 3, 33, 40, 2
    X = rng.standard_normal((2, M, I, T)).astype(np.float32)
    W0 = np.zeros((2, I, M, M), dtype=np.float32)
    W0[0] = np.eye(M, dtype=np.float32)
    Tb = (rng.random((M, I, K)) + 0.1).astype(np.float32)
    Vb = (rng.random((M, K, T)) + 0.1).astype(np.float32)
    Db = (rng.random((I, M, M)) + 0.1).astype(np.float32)

    from ssspy_tpu.ops import splitc as sc

    Xd = jax.device_put(X)
    Wd = jax.device_put(W0)

    def smoke(name, fn, *args):
        t0 = time.perf_counter()
        try:
            out = jax.jit(fn)(*args)
            leaves = jax.tree.leaves(out)
            host = [np.asarray(a) for a in leaves]
            ok = all(np.all(np.isfinite(h)) for h in host)
            results[name] = {
                "ok": bool(ok),
                "secs": round(time.perf_counter() - t0, 2),
            }
        except Exception as exc:
            results[name] = {"ok": False, "error": repr(exc)[:300]}
        print(name, results[name], flush=True)

    smoke("auxiva_ip1", sc.auxiva_ip1_step_sc, Xd, Wd)
    smoke("auxiva_ip2", sc.auxiva_ip2_step_sc, Xd, Wd)
    smoke("auxiva_iss1", sc.auxiva_iss1_step_sc, Xd)
    smoke("auxiva_iss2", sc.auxiva_iss2_step_sc, Xd)
    smoke("auxiva_ipa", sc.auxiva_ipa_step_sc, Xd)
    smoke("ilrma_ip1", sc.gauss_ilrma_ip1_step_sc, Xd, Wd, Tb, Vb)
    smoke("ilrma_ip2", sc.gauss_ilrma_ip2_step_sc, Xd, Wd, Tb, Vb)
    smoke("ilrma_iss1", sc.gauss_ilrma_iss1_step_sc, Xd, Tb, Vb)
    smoke("ilrma_iss2", sc.gauss_ilrma_iss2_step_sc, Xd, Tb, Vb)
    smoke("ilrma_ipa", sc.gauss_ilrma_ipa_step_sc, Xd, Tb, Vb)
    smoke("fdica_ip1", sc.aux_laplace_fdica_ip1_step_sc, Xd, Wd)
    smoke("fdica_ip2", sc.aux_laplace_fdica_ip2_step_sc, Xd, Wd)
    smoke("mnmf", sc.fast_gauss_mnmf_step_sc, Xd, Wd, Tb, Vb, Db)
    smoke(
        "t_ilrma_ip1",
        lambda X, W, T, V: sc.ilrma_ip_step_sc(X, W, T, V, model="t", dof=5.0),
        Xd, Wd, Tb, Vb,
    )
    smoke(
        "ggd_ilrma_iss1",
        lambda X, T, V: sc.ilrma_iss_step_sc(X, T, V, model="ggd", shape=1.5),
        Xd, Tb, Vb,
    )
    Hd = np.zeros((2, M, I, M, M), dtype=np.float32)
    Hd[0] = np.eye(M, dtype=np.float32) / M
    smoke(
        "gauss_mnmf_dense",
        lambda X, T, V, H: sc.gauss_mnmf_step_sc(
            sc.instant_covariance_sc(X), T, V, H
        ),
        Xd, Tb, Vb, jax.device_put(Hd),
    )
    Tp = np.zeros((2, M, K, 11, 3, 3), dtype=np.float32)
    Tp[0] = rng.random((M, K, 11, 3))[..., None].astype(np.float32) * np.eye(
        3, dtype=np.float32
    )
    smoke(
        "ipsdta_vcd",
        lambda X, W, Tp, V: sc.gauss_ipsdta_vcd_step_sc(X, W, [Tp], V),
        Xd, Wd, jax.device_put(Tp), Vb,
    )
    smoke("grad_iva", sc.grad_laplace_iva_step_sc, Xd, Wd)
    smoke(
        "natural_grad_fdica",
        lambda X, W: sc.grad_laplace_fdica_step_sc(X, W, natural=True),
        Xd, Wd,
    )
    smoke("whiten", sc.whiten_sc, Xd)
    smoke("fast_iva", sc.fast_iva_step_sc, Xd, Wd)
    smoke("faster_iva", sc.faster_iva_step_sc, Xd, Wd)
    Yd = jax.device_put(np.zeros((2, M, I, T), dtype=np.float32))
    smoke("pds_iva", sc.pds_iva_step_sc, Xd, Wd, Yd)
    zf = jax.device_put(np.zeros((2, I, M, M), dtype=np.float32))
    smoke("admm_iva", sc.admm_iva_step_sc, Xd, zf, Yd, zf, Yd)

    from ssspy_tpu.transform import istft_sc, stft_sc

    wave = rng.standard_normal((M, 4000)).astype(np.float32)
    smoke("stft_sc", lambda x: stft_sc(x, n_fft=256, hop_length=128), jax.device_put(wave))
    smoke(
        "stft_istft_roundtrip",
        lambda x: istft_sc(
            stft_sc(x, n_fft=256, hop_length=128), n_fft=256, hop_length=128, length=4000
        ),
        jax.device_put(wave),
    )

    # time-domain ICA is real-dtype: the class path runs on the chip as-is
    def ica_cls():
        from ssspy_tpu.bss.ica import NaturalGradLaplaceICA

        x = rng.standard_normal((2, 4000)).astype(np.float32)
        ica = NaturalGradLaplaceICA(record_loss=False)
        return jnp.asarray(ica(x, n_iter=3))

    smoke("ica_natural_grad_class_path", ica_cls)

    # class-API SC delegation: AuxIVA/GaussILRMA through the reference-
    # style single-call UX (ssspy/bss/iva.py:1637-1672), auto-routed to
    # the split-complex engine on this complex-rejecting backend. Not
    # wrapped in jax.jit: the class engine jits its own scan and commits
    # host NumPy attributes between calls.
    def smoke_host(name, fn):
        t0 = time.perf_counter()
        try:
            out = fn()
            ok = bool(np.all(np.isfinite(out)))
            results[name] = {"ok": ok, "secs": round(time.perf_counter() - t0, 2)}
        except Exception as exc:
            results[name] = {"ok": False, "error": repr(exc)[:300]}
        print(name, results[name], flush=True)

    Xc = X[0] + 1j * X[1]

    def auxiva_cls():
        from ssspy_tpu.bss.iva import AuxLaplaceIVA

        iva = AuxLaplaceIVA(spatial_algorithm="IP1")
        Y = iva(Xc, n_iter=3)
        assert iva.loss[-1] <= iva.loss[0], "class-API loss must not increase"
        return np.abs(Y)

    smoke_host("auxiva_class_path", auxiva_cls)

    def ilrma_cls():
        from ssspy_tpu.bss.ilrma import GaussILRMA

        il = GaussILRMA(2, spatial_algorithm="IP1", rng=np.random.default_rng(5))
        return np.abs(il(Xc, n_iter=3))

    smoke_host("gauss_ilrma_class_path", ilrma_cls)

    # round 5: the single-class UX now covers EVERY family on the chip —
    # one smoke per newly wired SC class engine
    def fdica_cls():
        from ssspy_tpu.bss.fdica import AuxLaplaceFDICA

        return np.abs(AuxLaplaceFDICA(spatial_algorithm="IP1")(Xc, n_iter=3))

    smoke_host("aux_fdica_class_path", fdica_cls)

    def grad_iva_cls():
        from ssspy_tpu.bss.iva import NaturalGradLaplaceIVA

        return np.abs(NaturalGradLaplaceIVA()(Xc, n_iter=3))

    smoke_host("natural_grad_iva_class_path", grad_iva_cls)

    def faster_iva_cls():
        import jax.numpy as jnp

        from ssspy_tpu.bss.iva import FasterIVA

        fi = FasterIVA(
            contrast_fn=lambda y: 2 * jnp.linalg.norm(y, axis=1),
            d_contrast_fn=lambda y: 2 * jnp.ones_like(y),
        )
        return np.abs(fi(Xc, n_iter=3))

    smoke_host("faster_iva_class_path", faster_iva_cls)

    def gauss_mnmf_cls():
        from ssspy_tpu.bss.mnmf import GaussMNMF

        mn = GaussMNMF(2, rng=np.random.default_rng(5), record_loss=False)
        return np.abs(mn(Xc, n_iter=2))

    smoke_host("gauss_mnmf_class_path", gauss_mnmf_cls)

    def fast_mnmf_cls():
        from ssspy_tpu.bss.mnmf import FastGaussMNMF

        mn = FastGaussMNMF(2, rng=np.random.default_rng(5), record_loss=False)
        return np.abs(mn(Xc, n_iter=3))

    smoke_host("fast_gauss_mnmf_class_path", fast_mnmf_cls)

    def ipsdta_cls():
        from ssspy_tpu.bss.ipsdta import GaussIPSDTA

        ip = GaussIPSDTA(
            n_basis=2, n_blocks=11, rng=np.random.default_rng(5), record_loss=False
        )
        return np.abs(ip(Xc, n_iter=2))

    smoke_host("gauss_ipsdta_class_path", ipsdta_cls)

    def pds_iva_cls():
        from ssspy_tpu.bss.iva import PDSIVA

        return np.abs(PDSIVA(record_loss=False)(Xc, n_iter=3))

    smoke_host("pds_iva_class_path", pds_iva_cls)

    def admm_iva_cls():
        from ssspy_tpu.bss.iva import ADMMIVA

        return np.abs(ADMMIVA(record_loss=False)(Xc, n_iter=3))

    smoke_host("admm_iva_class_path", admm_iva_cls)

    def hva_cls():
        from ssspy_tpu.bss.hva import HVA

        return np.abs(HVA()(Xc, n_iter=3))

    smoke_host("hva_class_path", hva_cls)

    def cacgmm_cls():
        from ssspy_tpu.bss.cacgmm import CACGMM

        cm = CACGMM(rng=np.random.default_rng(5), record_loss=False)
        return np.abs(cm(Xc, n_iter=3))

    smoke_host("cacgmm_class_path", cacgmm_cls)

    # the standalone eigh embedding (IPA's workhorse) at production size
    H = rng.standard_normal((257, 7, 7)).astype(np.float32)
    H = H @ H.swapaxes(-1, -2) + np.eye(7, dtype=np.float32)
    Hi = np.zeros_like(H)
    smoke("herm_eigh_embed", sc._herm_eigh_embed, jax.device_put(H), jax.device_put(Hi))

    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_smoke.json"
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
