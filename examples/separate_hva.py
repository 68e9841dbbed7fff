"""HVA: harmonic vector analysis (proximal splitting + cepstral mask).

Proximal-splitting methods are stable only when the PDS operator norm is
bounded — the reference ships ``normalize_by_spectral_norm`` for exactly
this, so the mixture is scaled before separation here (projection back
restores absolute scale against the original reference channel).
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

    if "--fast" in sys.argv:
        from ssspy_tpu.fast import fast_hva

        Y, _ = fast_hva(Xn, n_iter=100)
    else:
        from ssspy_tpu.bss.hva import HVA

        hva = HVA()
        Y = np.asarray(hva(Xn.astype(np.complex128), n_iter=100))
    Y = Y * norm  # undo the stability scaling (PB used the scaled reference)

    y = np.asarray(istft(Y, n_fft=512, hop_length=256, length=mix.shape[-1]))
    report(y, images, mix)
    save_wavs(y, "hva")


if __name__ == "__main__":
    main()
