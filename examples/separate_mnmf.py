"""FastGaussMNMF: jointly diagonalized spatial covariance model."""

import sys

import numpy as np

from _common import make_mixture, report, save_wavs


def main():
    mix, images = make_mixture()

    if "--fast" in sys.argv:
        from ssspy_tpu.fast import fast_gauss_mnmf
        from ssspy_tpu.transform import istft, stft

        X = np.asarray(stft(mix, n_fft=512, hop_length=256))
        Y, _ = fast_gauss_mnmf(X, n_basis=8, n_iter=100, rng=np.random.default_rng(0))
        y = np.asarray(istft(Y, n_fft=512, hop_length=256, length=mix.shape[-1]))
    else:
        from ssspy_tpu.bss.mnmf import FastGaussMNMF
        from ssspy_tpu.pipeline import separate

        mnmf = FastGaussMNMF(n_basis=8, rng=np.random.default_rng(0))
        y = np.asarray(separate(mix, mnmf, n_iter=100))

    report(y, images, mix)
    save_wavs(y, "mnmf")


if __name__ == "__main__":
    main()
