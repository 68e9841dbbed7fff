"""FastIVA / FasterIVA: whitened fixed-point IVA (Laplace contrast)."""

import sys

import numpy as np

from _common import make_mixture, report, save_wavs


def main():
    # fixed-point IVA is at its best on (near-)determined 2-source scenes
    mix, images = make_mixture(n_sources=2, duration=3.0)
    variant = "faster" if "--faster" in sys.argv else "fast"

    if "--class" in sys.argv:
        import jax.numpy as jnp

        from ssspy_tpu.bss.iva import FasterIVA, FastIVA
        from ssspy_tpu.pipeline import separate

        contrasts = dict(
            contrast_fn=lambda y: 2 * jnp.linalg.norm(y, axis=1),
            d_contrast_fn=lambda y: 2 * jnp.ones_like(y),
        )
        if variant == "fast":
            iva = FastIVA(dd_contrast_fn=lambda y: jnp.zeros_like(y), **contrasts)
        else:
            iva = FasterIVA(**contrasts)
        y = np.asarray(separate(mix, iva, n_iter=50))
    else:
        from ssspy_tpu.fast import fast_fast_iva, fast_faster_iva
        from ssspy_tpu.transform import istft, stft

        X = np.asarray(stft(mix, n_fft=512, hop_length=256))
        run = fast_fast_iva if variant == "fast" else fast_faster_iva
        Y = run(X, n_iter=50)
        y = np.asarray(istft(Y, n_fft=512, hop_length=256, length=mix.shape[-1]))

    report(y, images, mix)
    save_wavs(y, f"{variant}_iva")


if __name__ == "__main__":
    main()
