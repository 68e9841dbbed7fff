"""GaussILRMA separation (NMF source model + IP spatial updates)."""

import sys

import numpy as np

from _common import make_mixture, report, save_wavs


def main():
    mix, images = make_mixture()

    if "--fast" in sys.argv:
        from ssspy_tpu.fast import fast_gauss_ilrma
        from ssspy_tpu.transform import istft, stft

        X = np.asarray(stft(mix, n_fft=512, hop_length=256))
        Y, (T, V), W = fast_gauss_ilrma(
            X, n_basis=8, n_iter=100, rng=np.random.default_rng(0)
        )
        y = np.asarray(istft(Y, n_fft=512, hop_length=256, length=mix.shape[-1]))
    else:
        from ssspy_tpu.bss.ilrma import GaussILRMA
        from ssspy_tpu.pipeline import separate

        ilrma = GaussILRMA(n_basis=8, spatial_algorithm="IP", rng=np.random.default_rng(0))
        y = np.asarray(separate(mix, ilrma, n_iter=100))
        print(f"loss: {ilrma.loss[0]:.1f} -> {ilrma.loss[-1]:.1f}")

    report(y, images, mix)
    save_wavs(y, "ilrma")


if __name__ == "__main__":
    main()
