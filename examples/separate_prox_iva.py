"""PDSIVA / ADMMIVA: proximal-splitting IVA with the L21 penalty.

The mixture is scaled by its spectral norm first (the PDS/ADMM operator
norm must be bounded; the reference ships normalize_by_spectral_norm
for the same reason).
"""

import sys

import numpy as np

from _common import make_mixture, report, save_wavs, spectral_norm_scale


def main():
    mix, images = make_mixture()
    from ssspy_tpu.transform import istft, stft

    X = np.asarray(stft(mix, n_fft=512, hop_length=256))
    norm = spectral_norm_scale(X)
    Xn = X / norm

    if "--admm" in sys.argv:
        from ssspy_tpu.fast import fast_admm_iva

        Y, _ = fast_admm_iva(Xn, n_iter=200)
        tag = "admm_iva"
    else:
        from ssspy_tpu.fast import fast_pds_iva

        Y, _ = fast_pds_iva(Xn, n_iter=200)
        tag = "pds_iva"
    y = np.asarray(istft(Y * norm, n_fft=512, hop_length=256, length=mix.shape[-1]))
    report(y, images, mix)
    save_wavs(y, tag)


if __name__ == "__main__":
    main()
