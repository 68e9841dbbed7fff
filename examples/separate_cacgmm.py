"""cACGMM soft-mask separation — supports more sources than channels."""

import sys

import numpy as np

from _common import make_mixture, report, save_wavs


def main():
    mix, images = make_mixture(n_sources=2)

    if "--fast" in sys.argv:
        from ssspy_tpu.fast import fast_cacgmm
        from ssspy_tpu.transform import istft, stft

        X = np.asarray(stft(mix, n_fft=512, hop_length=256))
        Y = fast_cacgmm(X, n_iter=100, rng=np.random.default_rng(0))
        y = np.asarray(istft(Y, n_fft=512, hop_length=256, length=mix.shape[-1]))
    else:
        from ssspy_tpu.bss.cacgmm import CACGMM
        from ssspy_tpu.pipeline import separate

        gmm = CACGMM(rng=np.random.default_rng(0))
        y = np.asarray(separate(mix, gmm, n_iter=100))

    report(y, images, mix)
    save_wavs(y, "cacgmm")


if __name__ == "__main__":
    main()
