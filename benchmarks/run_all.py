"""Multi-algorithm benchmark: ssspy_tpu vs the NumPy reference.

Measures wall-clock per iteration for the BASELINE.json config list on
the current host (CPU backend for ours unless run on TPU), with the
reference (when importable at /root/reference) as denominator. Writes a
markdown table to BENCHMARKS.md and prints it.

Usage: python benchmarks/run_all.py [--n-iter 20] [--out BENCHMARKS.md]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAMPLE_RATE = 16_000


def make_mixture(n_channels, duration_s, n_fft, hop, seed=0):
    rng = np.random.default_rng(seed)
    n_samples = int(SAMPLE_RATE * duration_s)
    sources = rng.laplace(size=(n_channels, n_samples))
    taps = rng.standard_normal((n_channels, n_channels, 32)) * np.exp(
        -0.2 * np.arange(32)
    )
    try:
        from ssspy_tpu import native

        assert native.available()
        mix = native.convolutive_mix(sources, taps)
    except Exception:
        mix = np.zeros_like(sources)
        for m in range(n_channels):
            for n in range(n_channels):
                mix[m] += np.convolve(sources[n], taps[m, n], mode="same")

    win = np.hanning(n_fft + 1)[:-1]
    pad = n_fft // 2
    x = np.pad(mix, [(0, 0), (pad, pad)])
    n_frames = (x.shape[-1] - n_fft) // hop + 1
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = x[..., idx] * win
    return np.fft.rfft(frames, axis=-1).swapaxes(-2, -1) / win.sum(), mix


def _laplace(np_mod):
    return (
        lambda y: 2 * np_mod.linalg.norm(y, axis=1),
        lambda y: 2 * np_mod.ones_like(y),
    )


def build_cases():
    """name -> (ours_factory, ref_factory, input_kind)."""
    import jax.numpy as jnp

    from ssspy_tpu.bss import cacgmm, fdica, hva, ica, ilrma, iva, mnmf

    c_ours, d_ours = _laplace(jnp)

    cases = {}

    cases["AuxIVA-IP1 (3ch)"] = (
        lambda: iva.AuxIVA(spatial_algorithm="IP1", contrast_fn=c_ours, d_contrast_fn=d_ours),
        ("iva", "AuxIVA", dict(spatial_algorithm="IP1")),
        "spec3",
    )
    cases["AuxIVA-IP2 (3ch)"] = (
        lambda: iva.AuxIVA(spatial_algorithm="IP2", contrast_fn=c_ours, d_contrast_fn=d_ours),
        ("iva", "AuxIVA", dict(spatial_algorithm="IP2")),
        "spec3",
    )
    cases["AuxIVA-ISS1 (3ch)"] = (
        lambda: iva.AuxIVA(spatial_algorithm="ISS", contrast_fn=c_ours, d_contrast_fn=d_ours),
        ("iva", "AuxIVA", dict(spatial_algorithm="ISS")),
        "spec3",
    )
    cases["GradLaplaceICA (2ch)"] = (
        lambda: ica.GradLaplaceICA(step_size=0.01),
        ("ica", "GradLaplaceICA", dict(step_size=0.01)),
        "wave2",
    )
    cases["AuxLaplaceFDICA-IP1 (3ch)"] = (
        lambda: fdica.AuxLaplaceFDICA(spatial_algorithm="IP"),
        ("fdica", "AuxLaplaceFDICA", dict(spatial_algorithm="IP")),
        "spec3",
    )
    cases["GaussILRMA-IP1 (3ch, K=8)"] = (
        lambda: ilrma.GaussILRMA(n_basis=8, rng=np.random.default_rng(0)),
        ("ilrma", "GaussILRMA", dict(n_basis=8)),
        "spec3",
    )
    cases["GaussILRMA-IP1+PB-norm"] = (
        lambda: ilrma.GaussILRMA(
            n_basis=8, normalization="projection_back", rng=np.random.default_rng(0)
        ),
        ("ilrma", "GaussILRMA", dict(n_basis=8, normalization="projection_back")),
        "spec3",
    )
    cases["FastGaussMNMF (4ch, K=4)"] = (
        lambda: mnmf.FastGaussMNMF(n_basis=4, rng=np.random.default_rng(0)),
        ("mnmf", "FastGaussMNMF", dict(n_basis=4)),
        "spec4",
    )
    cases["cACGMM (3ch)"] = (
        lambda: cacgmm.CACGMM(rng=np.random.default_rng(0)),
        ("cacgmm", "CACGMM", dict()),
        "spec3",
    )
    cases["HVA (3ch)"] = (
        lambda: hva.HVA(),
        ("hva", "HVA", dict()),
        "spec3",
    )
    return cases


def time_ours(factory, data, n_iter):
    # one instance, identical n_iter twice: the first call compiles the
    # fused scan (cached per instance + static n_iter), the second call
    # is the steady-state cost a deployment sees
    method = factory()
    method(data.copy(), n_iter=n_iter)
    t0 = time.perf_counter()
    method(data.copy(), n_iter=n_iter)
    return (time.perf_counter() - t0) / n_iter


def time_ref(factory, data, n_iter):
    # fresh instances: the reference does not support reusing an
    # ISS-path instance across calls (second _reset crashes)
    factory()(data.copy(), n_iter=2)  # warm caches
    t0 = time.perf_counter()
    factory()(data.copy(), n_iter=n_iter)
    return (time.perf_counter() - t0) / n_iter


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-iter", type=int, default=20)
    parser.add_argument("--duration", type=float, default=3.0)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    import jax

    backend = jax.default_backend()

    spec3, wave3 = make_mixture(3, args.duration, 512, 256)
    spec4, _ = make_mixture(4, args.duration, 512, 256, seed=1)
    rng = np.random.default_rng(2)
    wave2 = rng.standard_normal((2, 2)) @ rng.laplace(
        size=(2, int(SAMPLE_RATE * args.duration))
    )
    inputs = {"spec3": spec3, "spec4": spec4, "wave2": wave2}

    sys.path.insert(0, "/root/reference")
    try:
        import ssspy.bss as ref_bss  # noqa: F401

        have_ref = True
    except Exception:
        have_ref = False

    rows = []
    for name, (ours_factory, ref_spec, kind) in build_cases().items():
        data = inputs[kind]
        ours_s = time_ours(ours_factory, data, args.n_iter)

        ref_s = None
        if have_ref:
            mod_name, cls_name, kwargs = ref_spec
            import importlib

            mod = importlib.import_module(f"ssspy.bss.{mod_name}")
            cls = getattr(mod, cls_name)
            if cls_name == "AuxIVA" or cls_name == "AuxFDICA":
                c_ref, d_ref = _laplace(np)
                kwargs = {**kwargs, "contrast_fn": c_ref, "d_contrast_fn": d_ref}
            if "rng" not in kwargs and cls_name in (
                "GaussILRMA",
                "FastGaussMNMF",
                "CACGMM",
            ):
                kwargs = {**kwargs, "rng": np.random.default_rng(0)}
            ref_data = data.astype(complex if kind != "wave2" else float)
            ref_s = time_ref(lambda: cls(**kwargs), ref_data, args.n_iter)

        speedup = (ref_s / ours_s) if ref_s else None
        rows.append((name, ours_s * 1e3, (ref_s or 0) * 1e3, speedup))
        print(
            f"{name:34s} ours {ours_s*1e3:8.2f} ms/it"
            + (f"   ref {ref_s*1e3:8.2f} ms/it   {speedup:6.1f}x" if ref_s else ""),
            flush=True,
        )

    if args.out:
        with open(args.out, "w") as f:
            f.write(
                f"# Benchmarks — ssspy_tpu (`{backend}` backend) vs NumPy reference\n\n"
                f"{args.n_iter} iterations each; ms per iteration; same host.\n\n"
                "| algorithm | ssspy_tpu (ms/it) | reference (ms/it) | speedup |\n"
                "|---|---|---|---|\n"
            )
            for name, ours_ms, ref_ms, speedup in rows:
                f.write(
                    f"| {name} | {ours_ms:.2f} | "
                    + (f"{ref_ms:.2f} | {speedup:.1f}x |\n" if speedup else "— | — |\n")
                )
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
