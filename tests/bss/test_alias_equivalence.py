"""Alias spatial algorithms must be numerically identical to their
canonical spellings (reference gates these behind --run-redundant on
release branches: ssspy tests/package/bss/test_iva.py:457; here they are
cheap enough to always run)."""

import jax.numpy as jnp
import numpy as np
import pytest


def _spec(seed=0, M=3, I=17, T=12):
    rng = np.random.default_rng(seed)
    return (
        rng.standard_normal((M, I, T)) + 1j * rng.standard_normal((M, I, T))
    ).astype(np.complex128)


def _laplace():
    return dict(
        contrast_fn=lambda y: 2 * jnp.linalg.norm(y, axis=1),
        d_contrast_fn=lambda y: 2 * jnp.ones_like(y),
    )


@pytest.mark.parametrize("alias,canonical", [("IP", "IP1"), ("ISS", "ISS1")])
def test_auxiva_alias_matches_canonical(alias, canonical):
    from ssspy_tpu.bss.iva import AuxIVA

    X = _spec()
    Y_a = AuxIVA(spatial_algorithm=alias, **_laplace())(X.copy(), n_iter=5)
    Y_c = AuxIVA(spatial_algorithm=canonical, **_laplace())(X.copy(), n_iter=5)
    np.testing.assert_allclose(np.asarray(Y_a), np.asarray(Y_c), atol=1e-12)


@pytest.mark.parametrize("alias,canonical", [("IP", "IP1"), ("ISS", "ISS1")])
def test_gauss_ilrma_alias_matches_canonical(alias, canonical):
    from ssspy_tpu.bss.ilrma import GaussILRMA

    X = _spec(1)
    rng = np.random.default_rng(2)
    init = {
        "basis": rng.random((3, 17, 2)),
        "activation": rng.random((3, 2, 12)),
    }
    Y_a = GaussILRMA(n_basis=2, spatial_algorithm=alias)(
        X.copy(), n_iter=5, basis=init["basis"].copy(), activation=init["activation"].copy()
    )
    Y_c = GaussILRMA(n_basis=2, spatial_algorithm=canonical)(
        X.copy(), n_iter=5, basis=init["basis"].copy(), activation=init["activation"].copy()
    )
    np.testing.assert_allclose(np.asarray(Y_a), np.asarray(Y_c), atol=1e-12)


def test_fdica_alias_matches_canonical():
    from ssspy_tpu.bss.fdica import AuxLaplaceFDICA

    X = _spec(3)
    Y_a = AuxLaplaceFDICA(spatial_algorithm="IP")(X.copy(), n_iter=5)
    Y_c = AuxLaplaceFDICA(spatial_algorithm="IP1")(X.copy(), n_iter=5)
    np.testing.assert_allclose(np.asarray(Y_a), np.asarray(Y_c), atol=1e-12)
