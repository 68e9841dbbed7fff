"""GaussIPSDTA: block-decomposed PSDTF source model + VCD spatial update."""

import sys

import numpy as np

from _common import make_mixture, report, save_wavs


def main():
    mix, images = make_mixture(n_sources=2, duration=2.0)

    if "--fast" in sys.argv:
        from ssspy_tpu.fast import fast_gauss_ipsdta
        from ssspy_tpu.transform import istft, stft

        X = np.asarray(stft(mix, n_fft=512, hop_length=256))
        Y, _, _ = fast_gauss_ipsdta(
            X, n_basis=2, n_blocks=64, n_iter=30, rng=np.random.default_rng(0)
        )
        y = np.asarray(istft(Y, n_fft=512, hop_length=256, length=mix.shape[-1]))
    else:
        from ssspy_tpu.bss.ipsdta import GaussIPSDTA
        from ssspy_tpu.pipeline import separate

        ipsdta = GaussIPSDTA(n_basis=2, n_blocks=64, rng=np.random.default_rng(0))
        y = np.asarray(separate(mix, ipsdta, n_iter=30))

    report(y, images, mix)
    save_wavs(y, "ipsdta")


if __name__ == "__main__":
    main()
