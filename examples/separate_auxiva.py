"""AuxIVA separation, class API or split-complex fast path (--fast)."""

import sys

import numpy as np

from _common import make_mixture, report, save_wavs


def main():
    mix, images = make_mixture()

    if "--fast" in sys.argv:
        # full on-device program: stft -> 100-iteration scan -> istft
        from ssspy_tpu.fast import fast_auxiva_wave

        y = fast_auxiva_wave(mix.astype(np.float32), n_iter=100, algorithm="IP1")
    else:
        import jax.numpy as jnp

        from ssspy_tpu.bss.iva import AuxIVA
        from ssspy_tpu.pipeline import separate

        iva = AuxIVA(
            spatial_algorithm="IP",
            contrast_fn=lambda y: 2 * jnp.linalg.norm(y, axis=1),
            d_contrast_fn=lambda y: 2 * jnp.ones_like(y),
        )
        y = np.asarray(separate(mix, iva, n_iter=100))
        print(f"loss: {iva.loss[0]:.1f} -> {iva.loss[-1]:.1f}")

    report(y, images, mix)
    save_wavs(y, "auxiva")


if __name__ == "__main__":
    main()
