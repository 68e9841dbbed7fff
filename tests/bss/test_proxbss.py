"""PDS/ADMM/HVA tests: smoke + parity vs the NumPy reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from ssspy_tpu.bss.admmbss import ADMMBSS, MaskingADMMBSS
from ssspy_tpu.bss.hva import HVA, MaskingADMMHVA, MaskingPDSHVA
from ssspy_tpu.bss.iva import ADMMIVA, PDSIVA
from ssspy_tpu.bss.pdsbss import PDSBSS, MaskingPDSBSS
from ssspy_tpu.linalg import prox
from ssspy_tpu.transform import stft

from ..helpers import requires_reference


def _mixture(n_sources=2, n_samples=4096, seed=0):
    from ssspy_tpu.utils.dataset import download_sample_speech_data

    images, _ = download_sample_speech_data(
        cache_dir="/tmp/ssspy_tpu_test_data",
        n_sources=n_sources,
        max_duration=n_samples / 16000,
        conv=True,
        seed=seed,
    )
    mix = images.sum(axis=0)
    return np.asarray(stft(mix, n_fft=256, hop_length=128))


def penalty_fn(y):
    return jnp.sum(jnp.linalg.norm(y, axis=1))


def prox_penalty(x, step_size=1):
    return prox.l21(x, step_size=step_size, axis2=1)


def test_pdsbss_smoke():
    X = _mixture()
    pds = PDSBSS(penalty_fn=penalty_fn, prox_penalty=prox_penalty)
    Y = np.asarray(pds(X, n_iter=5))
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))
    assert len(pds.loss) == 6


def test_pdsbss_multi_penalty():
    X = _mixture()
    pds = PDSBSS(
        penalty_fn=[penalty_fn, penalty_fn],
        prox_penalty=[prox_penalty, prox_penalty],
    )
    Y = np.asarray(pds(X, n_iter=3))
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))


def test_admmbss_smoke():
    X = _mixture()
    admm = ADMMBSS(penalty_fn=penalty_fn, prox_penalty=prox_penalty)
    Y = np.asarray(admm(X, n_iter=5))
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))
    assert len(admm.loss) == 6


@pytest.mark.parametrize("cls", [PDSIVA, ADMMIVA])
def test_prox_iva_smoke(cls):
    X = _mixture()
    method = cls()
    Y = np.asarray(method(X, n_iter=5))
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))
    assert len(method.loss) == 6


@pytest.mark.parametrize("cls", [HVA, MaskingPDSHVA, MaskingADMMHVA])
def test_hva_smoke(cls):
    X = _mixture()
    hva = cls()
    Y = np.asarray(hva(X, n_iter=5))
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))
    assert "HVA" in repr(hva)


def test_masking_pds_custom_mask():
    X = _mixture()

    def mask_fn(y):
        p = jnp.abs(y) ** 2
        return p / jnp.maximum(p.sum(axis=0), 1e-10)

    pds = MaskingPDSBSS(mask_fn=mask_fn)
    Y = np.asarray(pds(X, n_iter=3))
    assert Y.shape == X.shape
    assert np.all(np.isfinite(Y))


# ---------------- parity vs the NumPy reference ----------------


@requires_reference
def test_pdsbss_matches_reference():
    import ssspy.bss.pdsbss as ref_pdsbss
    from ssspy.linalg import prox as ref_prox

    X = _mixture(seed=1)

    ours = PDSBSS(penalty_fn=penalty_fn, prox_penalty=prox_penalty)
    # record_loss=True explicitly: the reference resolves its record_loss
    # default after passing it to the base class, so None means no recording
    # (ssspy/bss/proxbss.py:53-70); our build records whenever penalty_fn is set.
    theirs = ref_pdsbss.PDSBSS(
        penalty_fn=lambda y: float(np.sum(np.linalg.norm(y, axis=1))),
        prox_penalty=lambda x, step_size=1: ref_prox.l21(x, step_size=step_size, axis2=1),
        record_loss=True,
    )
    Y_ours = np.asarray(ours(X.copy(), n_iter=5))
    Y_theirs = theirs(X.copy(), n_iter=5)

    assert np.allclose(ours.loss, theirs.loss, atol=1e-5)
    assert np.allclose(Y_ours, Y_theirs, atol=1e-5), np.abs(Y_ours - Y_theirs).max()


@requires_reference
def test_admmbss_matches_reference():
    import ssspy.bss.admmbss as ref_admmbss
    from ssspy.linalg import prox as ref_prox

    X = _mixture(seed=2)

    ours = ADMMBSS(penalty_fn=penalty_fn, prox_penalty=prox_penalty)
    theirs = ref_admmbss.ADMMBSS(
        penalty_fn=lambda y: float(np.sum(np.linalg.norm(y, axis=1))),
        prox_penalty=lambda x, step_size=1: ref_prox.l21(x, step_size=step_size, axis2=1),
        record_loss=True,
    )
    Y_ours = np.asarray(ours(X.copy(), n_iter=5))
    Y_theirs = theirs(X.copy(), n_iter=5)

    assert np.allclose(ours.loss, theirs.loss, atol=1e-5)
    assert np.allclose(Y_ours, Y_theirs, atol=1e-5)


@requires_reference
def test_prox_iva_matches_reference():
    import ssspy.bss.iva as ref_iva

    X = _mixture(seed=3)

    for ours_cls, ref_cls in [(PDSIVA, ref_iva.PDSIVA), (ADMMIVA, ref_iva.ADMMIVA)]:
        ours = ours_cls()
        theirs = ref_cls()
        Y_ours = np.asarray(ours(X.copy(), n_iter=5))
        Y_theirs = theirs(X.copy(), n_iter=5)
        assert np.allclose(ours.loss, theirs.loss, atol=1e-5)
        assert np.allclose(Y_ours, Y_theirs, atol=1e-5)


@requires_reference
@pytest.mark.parametrize("cls_pair", ["pds", "admm"])
def test_hva_matches_reference(cls_pair):
    import ssspy.bss.hva as ref_hva

    X = _mixture(seed=4)

    if cls_pair == "pds":
        ours, theirs = MaskingPDSHVA(), ref_hva.MaskingPDSHVA()
    else:
        ours, theirs = MaskingADMMHVA(), ref_hva.MaskingADMMHVA()

    Y_ours = np.asarray(ours(X.copy(), n_iter=5))
    Y_theirs = theirs(X.copy(), n_iter=5)
    assert np.allclose(Y_ours, Y_theirs, atol=1e-5), np.abs(Y_ours - Y_theirs).max()
