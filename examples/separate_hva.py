"""HVA: harmonic vector analysis (proximal splitting + cepstral mask)."""

import numpy as np

from _common import make_mixture, report, save_wavs


def main():
    mix, images = make_mixture()

    from ssspy_tpu.bss.hva import HVA
    from ssspy_tpu.pipeline import separate

    y = np.asarray(separate(mix, HVA(), n_iter=100))
    report(y, images, mix)
    save_wavs(y, "hva")


if __name__ == "__main__":
    main()
