import numpy as np
import pytest

from ssspy_tpu.linalg import lqpqm2
from ssspy_tpu.linalg.lqpqm import solve_equation

from ..helpers import random_hermitian, requires_reference


@pytest.mark.parametrize("n", [2, 3])
def test_lqpqm2_linear_stationarity(n):
    """The solution satisfies (lamb I - H) y = H v for the solver's lamb.

    (The reference's normalization=True makes lamb the root of the
    *normalized* secular equation; the eigenbasis reconstruction identity
    still holds exactly.)
    """
    rng = np.random.default_rng(0)
    n_bins = 16
    H = random_hermitian(rng, (n_bins, n, n), psd=True)
    v = rng.standard_normal((n_bins, n)) + 1j * rng.standard_normal((n_bins, n))
    z = rng.uniform(0.5, 2.0, size=n_bins)

    phi, sigma = np.linalg.eigh(H)
    v_tilde = np.sum(sigma.conj() * v[:, :, None], axis=-2)
    lamb = np.asarray(solve_equation(phi, v_tilde, z, max_iter=50))

    y = np.asarray(lqpqm2(H, v, z, max_iter=50))
    lhs = lamb[:, None] * y - np.einsum("bmn,bn->bm", H, y)
    rhs = np.einsum("bmn,bn->bm", H, v)
    assert np.allclose(lhs, rhs, atol=1e-8)


@pytest.mark.parametrize("normalization", [True, False])
def test_solve_equation_is_root(normalization):
    rng = np.random.default_rng(1)
    n_bins, n = 32, 3
    phi = rng.uniform(0.1, 3.0, (n_bins, n))
    v = rng.standard_normal((n_bins, n)) + 1j * rng.standard_normal((n_bins, n))
    z = rng.uniform(0.1, 2.0, n_bins)
    lamb = np.asarray(
        solve_equation(phi, v, z, max_iter=200, normalization=normalization)
    )
    if normalization:
        # root of the normalized secular equation (reference semantics)
        c = phi.max(axis=-1)
        lamb_n, phi_n, v_n, z_n = lamb / c, phi / c[:, None], v / c[:, None], z / c
    else:
        lamb_n, phi_n, v_n, z_n = lamb, phi, v, z
    num = phi_n * np.abs(v_n) ** 2
    f = lamb_n**2 * np.sum(num / (lamb_n[:, None] - phi_n) ** 2, axis=-1) - lamb_n + z_n
    assert np.allclose(f, 0, atol=1e-6)
    assert np.all(lamb_n > phi_n.max(axis=-1))


def test_lqpqm2_singular_branch():
    rng = np.random.default_rng(2)
    n_bins, n = 8, 3
    H = random_hermitian(rng, (n_bins, n, n), psd=True)
    v = np.zeros((n_bins, n), dtype=complex)
    z = rng.uniform(0.1, 0.5, n_bins)

    y = np.asarray(lqpqm2(H, v, z, max_iter=10))
    phi, sigma = np.linalg.eigh(H)
    # y is along the top eigenvector with scale sqrt(max(phi_max, z) - z)/phi_max
    lamb = np.maximum(z, phi[:, -1])
    scale = np.sqrt(np.maximum((lamb - z) / phi[:, -1], 0))
    assert np.allclose(np.abs(y), np.abs(scale[:, None] * sigma[..., -1]), atol=1e-9)


@requires_reference
def test_lqpqm2_matches_reference():
    from ssspy.linalg import lqpqm2 as lqpqm2_ref

    rng = np.random.default_rng(3)
    n_bins, n = 24, 3
    H = random_hermitian(rng, (n_bins, n, n), psd=True)
    v = rng.standard_normal((n_bins, n)) + 1j * rng.standard_normal((n_bins, n))
    v[0] = 0  # include a singular bin
    z = rng.uniform(0.5, 2.0, n_bins)

    ours = np.asarray(lqpqm2(H, v, z, max_iter=10))
    theirs = lqpqm2_ref(H.copy(), v.copy(), z.copy(), max_iter=10)
    # non-singular bins: exact parity
    assert np.allclose(ours[1:], theirs[1:], atol=1e-6)
    # singular bin: the reference indexes the last *row* of the eigenvector
    # matrix (ssspy/linalg/lqpqm.py:86) where the math calls for the top
    # eigenvector (last column); we implement the column. The norms agree.
    assert np.isclose(np.linalg.norm(ours[0]), np.linalg.norm(theirs[0]), atol=1e-6)
    # and ours lies along the top eigenvector of H[0]
    _, sigma = np.linalg.eigh(H[0])
    top = sigma[:, -1]
    cos = np.abs(np.vdot(top, ours[0])) / (np.linalg.norm(ours[0]) + 1e-30)
    assert np.isclose(cos, 1.0, atol=1e-8)


@requires_reference
def test_solve_equation_matches_reference():
    from ssspy.linalg.lqpqm import solve_equation as solve_equation_ref

    rng = np.random.default_rng(4)
    n_bins, n = 32, 3
    phi = rng.uniform(0.1, 3.0, (n_bins, n))
    v = rng.standard_normal((n_bins, n)) + 1j * rng.standard_normal((n_bins, n))
    z = rng.uniform(0.1, 2.0, n_bins)
    for normalization in (True, False):
        ours = np.asarray(
            solve_equation(phi, v, z, max_iter=20, normalization=normalization)
        )
        theirs = solve_equation_ref(
            phi.copy(), v.copy(), z.copy(), max_iter=20, normalization=normalization
        )
        assert np.allclose(ours, theirs, atol=1e-7)
