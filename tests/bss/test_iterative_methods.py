"""Uniform driver contract: every algorithm is an IterativeMethodBase.

Parity target: ssspy tests/package/bss/test_iterative_methods.py —
guards that the whole public API shares the same iteration driver
(loss recording, callbacks, warm start).
"""

import numpy as np
import pytest

from ssspy_tpu.bss import IterativeMethodBase
from ssspy_tpu.bss.admmbss import ADMMBSS, MaskingADMMBSS
from ssspy_tpu.bss.cacgmm import CACGMM
from ssspy_tpu.bss.fdica import (
    AuxFDICA,
    AuxLaplaceFDICA,
    GradFDICA,
    GradLaplaceFDICA,
    NaturalGradFDICA,
    NaturalGradLaplaceFDICA,
)
from ssspy_tpu.bss.hva import HVA, MaskingADMMHVA, MaskingPDSHVA
from ssspy_tpu.bss.ica import (
    FastICA,
    GradICA,
    GradLaplaceICA,
    NaturalGradICA,
    NaturalGradLaplaceICA,
)
from ssspy_tpu.bss.ilrma import GGDILRMA, TILRMA, GaussILRMA
from ssspy_tpu.bss.ipsdta import GaussIPSDTA, TIPSDTA
from ssspy_tpu.bss.iva import (
    ADMMIVA,
    PDSIVA,
    AuxGaussIVA,
    AuxIVA,
    AuxLaplaceIVA,
    FasterIVA,
    FastIVA,
    GradGaussIVA,
    GradIVA,
    GradLaplaceIVA,
    NaturalGradGaussIVA,
    NaturalGradIVA,
    NaturalGradLaplaceIVA,
)
from ssspy_tpu.bss.mnmf import FastGaussMNMF, GaussMNMF
from ssspy_tpu.bss.pdsbss import PDSBSS, MaskingPDSBSS


def _contrast(y):
    import jax.numpy as jnp

    return 2 * jnp.linalg.norm(y, axis=1)


def _d_contrast(y):
    import jax.numpy as jnp

    return 2 * jnp.ones_like(y)


def _score(y):
    import jax.numpy as jnp

    return y / jnp.maximum(jnp.abs(y), 1e-10).astype(y.dtype)


_mask = _score  # any callable works for construction


CONSTRUCTORS = [
    lambda: GradICA(contrast_fn=_contrast, score_fn=_score),
    lambda: NaturalGradICA(contrast_fn=_contrast, score_fn=_score),
    lambda: FastICA(contrast_fn=_contrast, score_fn=_score, d_score_fn=_score),
    GradLaplaceICA,
    NaturalGradLaplaceICA,
    lambda: GradFDICA(contrast_fn=_contrast, score_fn=_score),
    lambda: NaturalGradFDICA(contrast_fn=_contrast, score_fn=_score),
    lambda: AuxFDICA(contrast_fn=_contrast, d_contrast_fn=_d_contrast),
    GradLaplaceFDICA,
    NaturalGradLaplaceFDICA,
    AuxLaplaceFDICA,
    lambda: GradIVA(contrast_fn=_contrast, score_fn=_score),
    lambda: NaturalGradIVA(contrast_fn=_contrast, score_fn=_score),
    lambda: FastIVA(
        contrast_fn=_contrast, d_contrast_fn=_d_contrast, dd_contrast_fn=_d_contrast
    ),
    lambda: FasterIVA(contrast_fn=_contrast, d_contrast_fn=_d_contrast),
    lambda: AuxIVA(contrast_fn=_contrast, d_contrast_fn=_d_contrast),
    GradLaplaceIVA,
    GradGaussIVA,
    NaturalGradLaplaceIVA,
    NaturalGradGaussIVA,
    AuxLaplaceIVA,
    AuxGaussIVA,
    PDSIVA,
    ADMMIVA,
    lambda: GaussILRMA(n_basis=2),
    lambda: TILRMA(n_basis=2, dof=10),
    lambda: GGDILRMA(n_basis=2, beta=1.5),
    lambda: GaussIPSDTA(n_basis=2, n_blocks=4),
    lambda: TIPSDTA(n_basis=2, n_blocks=4, dof=10),
    lambda: GaussMNMF(n_basis=2),
    lambda: FastGaussMNMF(n_basis=2),
    CACGMM,
    lambda: PDSBSS(prox_penalty=_mask, record_loss=False),
    lambda: ADMMBSS(prox_penalty=_mask, penalty_fn=lambda y: 0.0),
    lambda: MaskingPDSBSS(mask_fn=_mask),
    lambda: MaskingADMMBSS(mask_fn=_mask),
    HVA,
    MaskingPDSHVA,
    MaskingADMMHVA,
]


@pytest.mark.parametrize("ctor", CONSTRUCTORS)
def test_is_iterative_method(ctor):
    method = ctor()
    assert isinstance(method, IterativeMethodBase)
    assert hasattr(method, "loss")
    assert repr(method)


def test_public_class_count():
    """The reference README method table lists ~40 public classes."""
    assert len(CONSTRUCTORS) == 39
