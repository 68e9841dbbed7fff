"""AuxLaplaceFDICA: per-bin ICA + correlation permutation alignment."""

import sys

import numpy as np

from _common import make_mixture, report, save_wavs


def main():
    mix, images = make_mixture()

    if "--fast" in sys.argv:
        from ssspy_tpu.fast import fast_aux_fdica
        from ssspy_tpu.transform import istft, stft

        X = np.asarray(stft(mix, n_fft=512, hop_length=256))
        Y, W = fast_aux_fdica(X, n_iter=100)
        y = np.asarray(istft(Y, n_fft=512, hop_length=256, length=mix.shape[-1]))
    else:
        from ssspy_tpu.bss.fdica import AuxLaplaceFDICA
        from ssspy_tpu.pipeline import separate

        fdica = AuxLaplaceFDICA(spatial_algorithm="IP")
        y = np.asarray(separate(mix, fdica, n_iter=100))

    report(y, images, mix)
    save_wavs(y, "fdica")


if __name__ == "__main__":
    main()
