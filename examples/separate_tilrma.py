"""t-ILRMA / GGD-ILRMA: heavy-tailed source models on the fast path."""

import sys

import numpy as np

from _common import make_mixture, report, save_wavs


def main():
    mix, images = make_mixture()
    from ssspy_tpu.transform import istft, stft

    X = np.asarray(stft(mix, n_fft=512, hop_length=256))
    if "--ggd" in sys.argv:
        from ssspy_tpu.fast import fast_ggd_ilrma

        Y, _, _ = fast_ggd_ilrma(
            X, n_basis=2, beta=1.5, n_iter=50, rng=np.random.default_rng(0)
        )
        tag = "ggd_ilrma"
    else:
        from ssspy_tpu.fast import fast_t_ilrma

        Y, _, _ = fast_t_ilrma(
            X, n_basis=2, dof=5, n_iter=50, rng=np.random.default_rng(0)
        )
        tag = "t_ilrma"
    y = np.asarray(istft(Y, n_fft=512, hop_length=256, length=mix.shape[-1]))
    report(y, images, mix)
    save_wavs(y, tag)


if __name__ == "__main__":
    main()
