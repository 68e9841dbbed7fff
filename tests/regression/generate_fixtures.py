"""Generate regression fixtures by running the NumPy reference.

Mirrors the reference's regression tier (ssspy tests/regression/bss/*:
separated spectrogram after a pinned ``n_iter`` compared against a
stored target), but the fixtures are generated locally from
``/root/reference`` instead of downloaded from ``tky823/ssspy-data``
(this environment has no network). Run once; the ``.npz`` files are
checked in so the tier runs without the reference installed.

Usage: ``python tests/regression/generate_fixtures.py``
"""

import os
import sys

import numpy as np

sys.path.insert(0, "/root/reference")

HERE = os.path.dirname(os.path.abspath(__file__))
FIXTURE_DIR = os.path.join(HERE, "fixtures")

N_ITER = 10
N_FFT, HOP = 256, 128


def make_input(n_sources=2, n_samples=8000, seed=0):
    """Deterministic convolutive mixture -> complex128 STFT (M, I, T)."""
    rng = np.random.default_rng(seed)
    sources = rng.laplace(size=(n_sources, n_samples))
    taps = rng.standard_normal((n_sources, n_sources, 24)) * np.exp(
        -0.3 * np.arange(24)
    )
    mix = np.zeros_like(sources)
    for m in range(n_sources):
        for n in range(n_sources):
            mix[m] += np.convolve(sources[n], taps[m, n], mode="same")

    win = np.hanning(N_FFT + 1)[:-1]
    pad = N_FFT // 2
    x = np.pad(mix, [(0, 0), (pad, pad)])
    n_frames = (x.shape[-1] - N_FFT) // HOP + 1
    idx = np.arange(n_frames)[:, None] * HOP + np.arange(N_FFT)[None, :]
    frames = x[..., idx] * win
    return np.fft.rfft(frames, axis=-1).swapaxes(-2, -1) / win.sum()


def laplace_contrast(y):
    return 2 * np.linalg.norm(y, axis=1)


def laplace_d_contrast(y):
    return 2 * np.ones_like(y)


def nmf_init(n_sources, n_bins, n_frames, n_basis=2, seed=5):
    rng = np.random.default_rng(seed)
    return {
        "basis": rng.random((n_sources, n_bins, n_basis)),
        "activation": rng.random((n_sources, n_basis, n_frames)),
    }


def build_cases(X):
    """name -> callable(spectrogram) -> separated spectrogram."""
    import ssspy.bss.cacgmm as ref_cacgmm
    import ssspy.bss.fdica as ref_fdica
    import ssspy.bss.hva as ref_hva
    import ssspy.bss.ica as ref_ica
    import ssspy.bss.ilrma as ref_ilrma
    import ssspy.bss.ipsdta as ref_ipsdta
    import ssspy.bss.iva as ref_iva
    import ssspy.bss.mnmf as ref_mnmf

    n_sources, n_bins, n_frames = X.shape
    nmf = nmf_init(n_sources, n_bins, n_frames)

    def auxiva(spec, algo):
        m = ref_iva.AuxIVA(
            spatial_algorithm=algo,
            contrast_fn=laplace_contrast,
            d_contrast_fn=laplace_d_contrast,
        )
        return m(spec, n_iter=N_ITER)

    def psdtf_init(seed=6, n_blocks=4, n_basis=2):
        rng = np.random.default_rng(seed)
        n_remains = n_bins % n_blocks
        n_neighbors = n_bins // n_blocks
        eye = np.eye(n_neighbors, dtype=np.complex128)
        rand = rng.random((n_sources, n_basis, n_blocks - n_remains, n_neighbors))
        T = rand[..., np.newaxis] * eye
        if n_remains > 0:
            eye = np.eye(n_neighbors + 1, dtype=np.complex128)
            rand = rng.random((n_sources, n_basis, n_remains, n_neighbors + 1))
            T = (T, rand[..., np.newaxis] * eye)
        V = rng.random((n_sources, n_basis, n_frames))
        return {"basis": T, "activation": V}

    def laplace_score(y):
        norm = np.maximum(np.linalg.norm(y, axis=1, keepdims=True), 1e-10)
        return y / norm

    def grad_iva(spec, natural, is_holonomic):
        cls = ref_iva.NaturalGradIVA if natural else ref_iva.GradIVA
        m = cls(
            contrast_fn=laplace_contrast,
            score_fn=laplace_score,
            is_holonomic=is_holonomic,
        )
        return m(spec, n_iter=N_ITER)

    def fast_iva(spec):
        m = ref_iva.FastIVA(
            contrast_fn=laplace_contrast,
            d_contrast_fn=laplace_d_contrast,
            dd_contrast_fn=lambda y: 2 * np.zeros_like(y),
        )
        return m(spec, n_iter=5)

    def grad_fdica(spec, natural, is_holonomic):
        cls = (
            ref_fdica.NaturalGradLaplaceFDICA if natural else ref_fdica.GradLaplaceFDICA
        )
        return cls(is_holonomic=is_holonomic)(spec, n_iter=N_ITER)

    def ilrma(spec, cls_name, spatial, source="MM", **kw):
        cls = getattr(ref_ilrma, cls_name)
        m = cls(n_basis=2, spatial_algorithm=spatial, source_algorithm=source, **kw)
        return m(spec, n_iter=N_ITER, **{k: v.copy() for k, v in nmf.items()})

    cases = {
        "auxiva_ip1": lambda s: auxiva(s, "IP1"),
        "auxiva_ip2": lambda s: auxiva(s, "IP2"),
        "auxiva_iss1": lambda s: auxiva(s, "ISS"),
        "auxiva_iss2": lambda s: auxiva(s, "ISS2"),
        "auxiva_ipa": lambda s: auxiva(s, "IPA"),
        "fast_iva": fast_iva,
        "grad_iva_holonomic": lambda s: grad_iva(s, False, True),
        "grad_iva_nonholonomic": lambda s: grad_iva(s, False, False),
        "natural_grad_iva_holonomic": lambda s: grad_iva(s, True, True),
        "natural_grad_iva_nonholonomic": lambda s: grad_iva(s, True, False),
        "aux_laplace_fdica_ip1": lambda s: ref_fdica.AuxLaplaceFDICA(
            spatial_algorithm="IP"
        )(s, n_iter=N_ITER),
        "aux_laplace_fdica_ip2": lambda s: ref_fdica.AuxLaplaceFDICA(
            spatial_algorithm="IP2"
        )(s, n_iter=N_ITER),
        "grad_laplace_fdica_holonomic": lambda s: grad_fdica(s, False, True),
        "grad_laplace_fdica_nonholonomic": lambda s: grad_fdica(s, False, False),
        "natural_grad_laplace_fdica_holonomic": lambda s: grad_fdica(s, True, True),
        "natural_grad_laplace_fdica_nonholonomic": lambda s: grad_fdica(s, True, False),
        "gauss_ilrma_ip1": lambda s: ref_ilrma.GaussILRMA(
            n_basis=2, spatial_algorithm="IP"
        )(s, n_iter=N_ITER, **{k: v.copy() for k, v in nmf.items()}),
        "t_ilrma_ip1": lambda s: ref_ilrma.TILRMA(
            n_basis=2, dof=100, spatial_algorithm="IP"
        )(s, n_iter=N_ITER, **{k: v.copy() for k, v in nmf.items()}),
        "cacgmm": lambda s: ref_cacgmm.CACGMM(rng=np.random.default_rng(9))(
            s, n_iter=N_ITER
        ),
        "gauss_mnmf": lambda s: ref_mnmf.GaussMNMF(n_basis=2)(
            s, n_iter=3, **{k: v.copy() for k, v in nmf.items()}
        ),
        "fast_gauss_mnmf_ip1": lambda s: ref_mnmf.FastGaussMNMF(
            n_basis=2, rng=np.random.default_rng(11)
        )(s, n_iter=N_ITER),
        "fast_gauss_mnmf_ip2": lambda s: ref_mnmf.FastGaussMNMF(
            n_basis=2,
            diagonalizer_algorithm="IP2",
            rng=np.random.default_rng(11),
        )(s, n_iter=N_ITER),
        "gauss_ipsdta_vcd": lambda s: ref_ipsdta.GaussIPSDTA(n_basis=2, n_blocks=4)(
            s, n_iter=3, **psdtf_init()
        ),
        "t_ipsdta_vcd": lambda s: ref_ipsdta.TIPSDTA(n_basis=2, n_blocks=4, dof=1000)(
            s, n_iter=3, **psdtf_init()
        ),
        "hva": lambda s: ref_hva.HVA()(s, n_iter=N_ITER),
    }

    # GaussILRMA spatial x source matrix (IP1/MM covered above)
    for spatial in ("IP2", "ISS1", "ISS2", "IPA"):
        cases[f"gauss_ilrma_{spatial.lower()}"] = (
            lambda s, sp=spatial: ilrma(s, "GaussILRMA", sp)
        )

    # partitioned (shared-basis latent) GaussILRMA with the IPA spatial
    # update — a reference-valid config (ssspy/bss/ilrma.py:1811-1821
    # computes the partitioned r_ijn for IPA)
    def nmf_part_init(seed=5, n_basis=2):
        rng = np.random.default_rng(seed)
        Z = rng.random((n_sources, n_basis))
        return {
            "latent": Z / Z.sum(axis=0),
            "basis": rng.random((n_bins, n_basis)),
            "activation": rng.random((n_basis, n_frames)),
        }

    def ilrma_part(spec, spatial, source="MM"):
        m = ref_ilrma.GaussILRMA(
            n_basis=2,
            spatial_algorithm=spatial,
            source_algorithm=source,
            partitioning=True,
        )
        init = nmf_part_init()
        return m(spec, n_iter=N_ITER, **{k: v.copy() for k, v in init.items()})

    cases["gauss_ilrma_ipa_partitioning"] = lambda s: ilrma_part(s, "IPA")
    cases["gauss_ilrma_ipa_partitioning_me"] = lambda s: ilrma_part(
        s, "IPA", source="ME"
    )
    for spatial in ("IP1", "IP2", "ISS1", "ISS2", "IPA"):
        cases[f"gauss_ilrma_{spatial.lower()}_me"] = (
            lambda s, sp=spatial: ilrma(s, "GaussILRMA", sp, source="ME")
        )
    # TILRMA (dof=1000, matching the reference fixture config) MM + ME
    for spatial in ("IP1", "IP2", "ISS1", "ISS2"):
        cases[f"t_ilrma_{spatial.lower()}_mm"] = (
            lambda s, sp=spatial: ilrma(s, "TILRMA", sp, dof=1000)
        )
        cases[f"t_ilrma_{spatial.lower()}_me"] = (
            lambda s, sp=spatial: ilrma(s, "TILRMA", sp, source="ME", dof=1000)
        )
    # GGDILRMA (beta=1.5) MM only (ME unsupported, like the reference)
    for spatial in ("IP1", "IP2", "ISS1", "ISS2"):
        cases[f"ggd_ilrma_{spatial.lower()}"] = (
            lambda s, sp=spatial: ilrma(s, "GGDILRMA", sp, beta=1.5)
        )

    return cases


def main():
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    X = make_input()
    np.savez_compressed(os.path.join(FIXTURE_DIR, "input.npz"), spectrogram=X)

    for name, runner in build_cases(X).items():
        path = os.path.join(FIXTURE_DIR, f"{name}.npz")
        if os.path.exists(path):
            print(f"{name}: exists, skipping")
            continue
        target = runner(X.copy())
        np.savez_compressed(path, target=np.asarray(target))
        print(f"{name}: {np.asarray(target).shape}")

    # time-domain ICA fixture
    import ssspy.bss.ica as ref_ica

    rng = np.random.default_rng(3)
    s = rng.laplace(size=(2, 8000))
    A = rng.standard_normal((2, 2)) + np.eye(2)
    waveform = A @ s
    np.savez_compressed(os.path.join(FIXTURE_DIR, "input_time.npz"), waveform=waveform)
    target = ref_ica.NaturalGradLaplaceICA(step_size=0.05)(waveform.copy(), n_iter=20)
    np.savez_compressed(
        os.path.join(FIXTURE_DIR, "natural_grad_laplace_ica.npz"), target=target
    )
    print("natural_grad_laplace_ica:", target.shape)


if __name__ == "__main__":
    main()
