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


class TestFlooredSecularF32Overflow:
    """The floored-secular degenerate regime must stay finite in f32.

    When every ``phi |v|^2`` falls below the mask floor, ``phi_max``
    collapses to the 1e-10 floor and ``normalization=True`` rescales
    ``z' = z / 1e-10 ~ 1e9`` — the raw Cardano coefficients then
    overflow f32 (``A^3 ~ 1e29``) and, under XLA fusion, the +inf
    escaped the bracket clamp and cascaded NaN through the whole IPA
    spectrogram (observed at AuxIVA-IPA iteration 13 on an
    instantaneous 3-source mixture). The root finders now evaluate on
    homogeneously rescaled coefficients and the initializer output is
    finiteness-guarded; the root in this regime is exactly ``z``.
    """

    def _degenerate_inputs(self, dtype):
        import jax.numpy as jnp

        phi = jnp.asarray([[0.49346644, 0.5065335]], dtype)
        v = jnp.sqrt(jnp.asarray([[1.5539143e-11, 9.2165144e-11]], dtype))
        z = jnp.asarray([0.570350], dtype)
        return phi, v, z

    @pytest.mark.parametrize("dtype", ["float32", "float64"])
    def test_all_masked_root_is_z(self, dtype):
        import functools

        import jax
        import jax.numpy as jnp

        from ssspy_tpu.linalg.lqpqm import _find_largest_root_real
        from ssspy_tpu.special.flooring import max_flooring

        phi, v, z = self._degenerate_inputs(jnp.dtype(dtype))
        fl = functools.partial(max_flooring, eps=1e-10)
        lamb = jax.jit(
            lambda p, vv, zz: solve_equation(
                p,
                vv,
                zz,
                flooring_fn=fl,
                max_iter=1,
                normalization=True,
                root_finder=_find_largest_root_real,
            )
        )(phi, v, z)
        lamb = np.asarray(lamb)
        assert np.isfinite(lamb).all()
        assert np.allclose(lamb, 0.570350, rtol=1e-5)

    @pytest.mark.parametrize("finder", ["complex", "real"])
    def test_root_finder_huge_coefficients_f32(self, finder):
        """Scaled evaluation matches f64 on coefficients whose raw
        Cardano intermediates overflow f32."""
        import jax.numpy as jnp

        from ssspy_tpu.linalg.lqpqm import (
            _find_largest_root,
            _find_largest_root_real,
        )

        fn = _find_largest_root if finder == "complex" else _find_largest_root_real
        # the observed degenerate-secular coefficients: z' ~ 5.7e9
        zp = 5.7035e9
        A = np.asarray([-(2.0 + zp)])
        B = np.asarray([1.0 + 2 * zp])
        C = np.asarray([-zp])
        r64 = np.asarray(fn(jnp.asarray(A), jnp.asarray(B), jnp.asarray(C)))
        r32 = np.asarray(
            fn(
                jnp.asarray(A, jnp.float32),
                jnp.asarray(B, jnp.float32),
                jnp.asarray(C, jnp.float32),
            )
        )
        assert np.isfinite(r32).all()
        # exact factorization: (x - z')(x - 1)^2 — largest root z'
        assert np.allclose(r64, zp, rtol=1e-12)
        assert np.allclose(r32, zp, rtol=1e-5)

    def test_ipa_f32_long_run_stays_finite(self):
        """End-to-end pin of the observed failure: 3-source instantaneous
        laplace mixture, f32 IPA through the eigh path, 20 iterations
        (NaN appeared at 13 before the fix)."""
        import jax

        from ssspy_tpu.ops import splitc as sc
        from ssspy_tpu.transform import stft

        rng = np.random.default_rng(0)
        s = rng.laplace(size=(3, 8000))
        A = rng.standard_normal((3, 3))
        X = np.asarray(stft(A @ s, n_fft=512, hop_length=256))
        Ys = np.stack([X.real, X.imag]).astype(np.float32)
        step = jax.jit(
            lambda Y: sc.auxiva_ipa_step_sc(
                Y, psd_impl="eigh", secular_impl="eigh"
            )
        )
        import jax.numpy as jnp

        Y = jnp.asarray(Ys)
        for _ in range(20):
            Y = step(Y)
        assert np.isfinite(np.asarray(Y)).all()
