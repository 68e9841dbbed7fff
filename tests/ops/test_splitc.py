"""Split-complex kernel parity vs the complex64 path."""

import jax
import jax.numpy as jnp
import numpy as np

from ssspy_tpu.ops.splitc import auxiva_ip1_step_sc, csolve, from_split, to_split
from ssspy_tpu.parallel import auxiva_ip1_step


def test_csolve_matches_complex():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((7, 5, 5)) + 1j * rng.standard_normal((7, 5, 5))
    A = A + 5 * np.eye(5)
    b = rng.standard_normal((7, 5)) + 1j * rng.standard_normal((7, 5))

    xr, xi = csolve(
        jnp.asarray(A.real), jnp.asarray(A.imag), jnp.asarray(b.real), jnp.asarray(b.imag)
    )
    x_ref = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(xr) + 1j * np.asarray(xi), x_ref, atol=1e-10)


def test_auxiva_step_matches_complex_path():
    rng = np.random.default_rng(1)
    M, I, T = 3, 17, 50
    X = (rng.standard_normal((M, I, T)) + 1j * rng.standard_normal((M, I, T))).astype(
        np.complex64
    )
    W = np.tile(np.eye(M, dtype=np.complex64), (I, 1, 1))

    # several iterations to propagate any divergence
    Xs = jnp.asarray(to_split(X))
    Ws = jnp.asarray(to_split(W))
    Wc = jnp.asarray(W)
    for _ in range(3):
        Ws = auxiva_ip1_step_sc(Xs, Ws)
        Wc = auxiva_ip1_step(jnp.asarray(X), Wc)

    W_sc = from_split(np.asarray(Ws))
    np.testing.assert_allclose(W_sc, np.asarray(Wc), atol=2e-4)


def test_auxiva_step_sc_jit_and_x64():
    """Jitted split-complex step agrees with float64 complex at tight tol."""
    rng = np.random.default_rng(2)
    M, I, T = 2, 9, 30
    X = rng.standard_normal((M, I, T)) + 1j * rng.standard_normal((M, I, T))
    W = np.tile(np.eye(M, dtype=complex), (I, 1, 1))

    Xs = jnp.asarray(np.stack([X.real, X.imag]))  # f64 under x64 tests
    Ws = jnp.asarray(np.stack([W.real, W.imag]))
    step = jax.jit(auxiva_ip1_step_sc)
    Ws = step(Xs, Ws)

    Wc = auxiva_ip1_step(jnp.asarray(X), jnp.asarray(W))
    np.testing.assert_allclose(
        np.asarray(Ws[0]) + 1j * np.asarray(Ws[1]), np.asarray(Wc), atol=1e-10
    )


def test_gauss_ilrma_step_matches_class():
    """Split-complex ILRMA step tracks GaussILRMA(IP1, MM, power) exactly."""
    import jax
    from ssspy_tpu.bss.ilrma import GaussILRMA
    from ssspy_tpu.ops.splitc import gauss_ilrma_ip1_step_sc

    rng = np.random.default_rng(5)
    M, I, T_frames, K = 2, 9, 20, 3
    X = rng.standard_normal((M, I, T_frames)) + 1j * rng.standard_normal((M, I, T_frames))
    T0 = rng.random((M, I, K)) + 0.1
    V0 = rng.random((M, K, T_frames)) + 0.1

    # reference-class path (complex128 under the x64 test config)
    ilrma = GaussILRMA(n_basis=K, spatial_algorithm="IP", scale_restoration=False)
    ilrma(X.copy(), n_iter=3, basis=T0.copy(), activation=V0.copy())
    W_cls = np.asarray(ilrma.demix_filter)

    # split-complex path (f64 planar under x64)
    Xs = jnp.asarray(np.stack([X.real, X.imag]))
    W0 = np.tile(np.eye(M, dtype=complex), (I, 1, 1))
    Ws = jnp.asarray(np.stack([W0.real, W0.imag]))
    Tb, Vb = jnp.asarray(T0), jnp.asarray(V0)
    import functools
    step = jax.jit(functools.partial(gauss_ilrma_ip1_step_sc, eps=1e-10))
    for _ in range(3):
        Ws, Tb, Vb = step(Xs, Ws, Tb, Vb)

    W_sc = np.asarray(Ws[0]) + 1j * np.asarray(Ws[1])
    np.testing.assert_allclose(W_sc, W_cls, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Tb), np.asarray(ilrma.basis), atol=1e-8)
    np.testing.assert_allclose(np.asarray(Vb), np.asarray(ilrma.activation), atol=1e-8)


def test_gauss_jordan_solve_matches_lapack():
    rng = np.random.default_rng(9)
    from ssspy_tpu.ops.splitc import gauss_jordan_solve

    A = rng.standard_normal((64, 16, 16))
    b = rng.standard_normal((64, 16))
    x = np.asarray(gauss_jordan_solve(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(A, b[..., None])[..., 0], atol=1e-7)

    # partial pivoting handles a zero leading pivot
    A[:, 0, 0] = 0.0
    x = np.asarray(gauss_jordan_solve(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(A, b[..., None])[..., 0], atol=1e-6)


def test_csolve_gj_impl_matches_lu():
    rng = np.random.default_rng(10)
    from ssspy_tpu.ops.splitc import csolve

    A = rng.standard_normal((31, 8, 8)) + 1j * rng.standard_normal((31, 8, 8))
    A = A + 8 * np.eye(8)
    b = rng.standard_normal((31, 8)) + 1j * rng.standard_normal((31, 8))
    args = [jnp.asarray(v) for v in (A.real, A.imag, b.real, b.imag)]
    xr_lu, xi_lu = csolve(*args, impl="lu")
    xr_gj, xi_gj = csolve(*args, impl="gj")
    np.testing.assert_allclose(np.asarray(xr_gj), np.asarray(xr_lu), atol=1e-9)
    np.testing.assert_allclose(np.asarray(xi_gj), np.asarray(xi_lu), atol=1e-9)


def test_gauss_jordan_nopivot_matches_on_conditioned_systems():
    rng = np.random.default_rng(11)
    from ssspy_tpu.ops.splitc import gauss_jordan_solve_nopivot

    # diagonally-loaded systems, like the IP sweep's W U_n at init
    A = rng.standard_normal((64, 16, 16)) + 16 * np.eye(16)
    b = rng.standard_normal((64, 16))
    x = np.asarray(gauss_jordan_solve_nopivot(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(A, b[..., None])[..., 0], atol=1e-8)


def test_auxiva_iss1_step_matches_complex_kernel():
    import jax

    from ssspy_tpu.bss._update_spatial_model import update_by_iss1
    from ssspy_tpu.ops.splitc import auxiva_iss1_step_sc

    rng = np.random.default_rng(12)
    N, I, T = 3, 9, 25
    Y = rng.standard_normal((N, I, T)) + 1j * rng.standard_normal((N, I, T))

    # complex path: IVA ISS weights G'(r)/2r with Laplace contrast = 1/r
    Ys = jnp.asarray(np.stack([Y.real, Y.imag]))
    Ys = jax.jit(auxiva_iss1_step_sc)(Ys)
    Y_sc = np.asarray(Ys[0]) + 1j * np.asarray(Ys[1])

    norm = np.maximum(np.linalg.norm(Y, axis=1), 1e-10)
    varphi = (1.0 / norm)[:, None, :]
    Y_ref = np.asarray(update_by_iss1(jnp.asarray(Y), jnp.asarray(varphi)))

    np.testing.assert_allclose(Y_sc, Y_ref, atol=1e-10)


def test_auxiva_ip2_step_matches_class():
    """Planar IP2 (pairwise scalarized GEVD) tracks the class path exactly."""
    import jax
    from ssspy_tpu.bss.iva import AuxIVA
    from ssspy_tpu.ops.splitc import auxiva_ip2_step_sc

    rng = np.random.default_rng(6)
    M, I, T = 3, 9, 30
    X = rng.standard_normal((M, I, T)) + 1j * rng.standard_normal((M, I, T))
    W0 = np.tile(np.eye(M, dtype=complex), (I, 1, 1))

    iva = AuxIVA(
        spatial_algorithm="IP2",
        contrast_fn=lambda y: 2 * jnp.linalg.norm(y, axis=1),
        d_contrast_fn=lambda y: 2 * jnp.ones_like(y),
        scale_restoration=False,
    )
    iva(X.copy(), n_iter=3)

    Xs = jnp.asarray(np.stack([X.real, X.imag]))
    Ws = jnp.asarray(np.stack([W0.real, W0.imag]))
    step = jax.jit(auxiva_ip2_step_sc)
    for _ in range(3):
        Ws = step(Xs, Ws)

    W_sc = np.asarray(Ws[0]) + 1j * np.asarray(Ws[1])
    np.testing.assert_allclose(W_sc, np.asarray(iva.demix_filter), atol=1e-10)


def test_gevd2_sc_matches_eigh2():
    from ssspy_tpu.linalg import eigh2
    from ssspy_tpu.ops.splitc import _gevd2_sc

    rng = np.random.default_rng(7)
    I = 16
    A = rng.standard_normal((I, 2, 2)) + 1j * rng.standard_normal((I, 2, 2))
    A = A @ A.conj().swapaxes(-2, -1) + 2 * np.eye(2)
    B = rng.standard_normal((I, 2, 2)) + 1j * rng.standard_normal((I, 2, 2))
    B = B @ B.conj().swapaxes(-2, -1) + 2 * np.eye(2)

    _, H = eigh2(jnp.asarray(A), jnp.asarray(B))
    H = np.asarray(H)

    args = [
        jnp.asarray(v)
        for v in (
            A[:, 0, 0].real, A[:, 0, 1].real, A[:, 0, 1].imag, A[:, 1, 1].real,
            B[:, 0, 0].real, B[:, 0, 1].real, B[:, 0, 1].imag, B[:, 1, 1].real,
        )
    ]
    lo, hi = _gevd2_sc(*args)
    lo = np.stack([np.asarray(lo[0]) + 1j * np.asarray(lo[1]),
                   np.asarray(lo[2]) + 1j * np.asarray(lo[3])], axis=-1)
    hi = np.stack([np.asarray(hi[0]) + 1j * np.asarray(hi[1]),
                   np.asarray(hi[2]) + 1j * np.asarray(hi[3])], axis=-1)
    np.testing.assert_allclose(lo, H[..., 0], atol=1e-12)
    np.testing.assert_allclose(hi, H[..., 1], atol=1e-12)


def test_auxiva_iss2_step_matches_class():
    import jax
    from ssspy_tpu.bss.iva import AuxIVA
    from ssspy_tpu.ops.splitc import auxiva_iss2_step_sc

    rng = np.random.default_rng(8)
    M, I, T = 4, 9, 30
    X = rng.standard_normal((M, I, T)) + 1j * rng.standard_normal((M, I, T))

    iva = AuxIVA(
        spatial_algorithm="ISS2",
        contrast_fn=lambda y: 2 * jnp.linalg.norm(y, axis=1),
        d_contrast_fn=lambda y: 2 * jnp.ones_like(y),
        scale_restoration=False,
    )
    Y_cls = np.asarray(iva(X.copy(), n_iter=3))

    Ys = jnp.asarray(np.stack([X.real, X.imag]))
    step = jax.jit(auxiva_iss2_step_sc)
    for _ in range(3):
        Ys = step(Ys)
    Y_sc = np.asarray(Ys[0]) + 1j * np.asarray(Ys[1])
    np.testing.assert_allclose(Y_sc, Y_cls, atol=1e-10)


def test_gauss_ilrma_iss1_step_matches_class():
    import jax
    from ssspy_tpu.bss.ilrma import GaussILRMA
    from ssspy_tpu.ops.splitc import gauss_ilrma_iss1_step_sc

    rng = np.random.default_rng(9)
    M, I, T_frames, K = 2, 9, 20, 3
    X = rng.standard_normal((M, I, T_frames)) + 1j * rng.standard_normal((M, I, T_frames))
    T0 = rng.random((M, I, K)) + 0.1
    V0 = rng.random((M, K, T_frames)) + 0.1

    ilrma = GaussILRMA(n_basis=K, spatial_algorithm="ISS", scale_restoration=False)
    ilrma(X.copy(), n_iter=3, basis=T0.copy(), activation=V0.copy())
    Y_cls = np.asarray(ilrma.output)

    import functools

    Ys = jnp.asarray(np.stack([X.real, X.imag]))
    Tb, Vb = jnp.asarray(T0), jnp.asarray(V0)
    step = jax.jit(functools.partial(gauss_ilrma_iss1_step_sc, eps=1e-10))
    for _ in range(3):
        Ys, Tb, Vb = step(Ys, Tb, Vb)

    Y_sc = np.asarray(Ys[0]) + 1j * np.asarray(Ys[1])
    np.testing.assert_allclose(Y_sc, Y_cls, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Tb), np.asarray(ilrma.basis), atol=1e-8)


def _ilrma_fixture(seed=5, M=3, I=9, T_frames=20, K=3):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((M, I, T_frames)) + 1j * rng.standard_normal(
        (M, I, T_frames)
    )
    T0 = rng.random((M, I, K)) + 0.1
    V0 = rng.random((M, K, T_frames)) + 0.1
    return X, T0, V0


def test_gauss_ilrma_ip2_step_matches_class():
    """Split-complex ILRMA IP2 step tracks GaussILRMA(IP2, MM, power)."""
    import functools

    from ssspy_tpu.bss.ilrma import GaussILRMA
    from ssspy_tpu.ops.splitc import gauss_ilrma_ip2_step_sc

    X, T0, V0 = _ilrma_fixture()
    M, I = X.shape[0], X.shape[1]

    ilrma = GaussILRMA(n_basis=T0.shape[-1], spatial_algorithm="IP2", scale_restoration=False)
    ilrma(X.copy(), n_iter=3, basis=T0.copy(), activation=V0.copy())
    W_cls = np.asarray(ilrma.demix_filter)

    Xs = jnp.asarray(np.stack([X.real, X.imag]))
    W0 = np.tile(np.eye(M, dtype=complex), (I, 1, 1))
    Ws = jnp.asarray(np.stack([W0.real, W0.imag]))
    Tb, Vb = jnp.asarray(T0), jnp.asarray(V0)
    step = jax.jit(functools.partial(gauss_ilrma_ip2_step_sc, eps=1e-10))
    for _ in range(3):
        Ws, Tb, Vb = step(Xs, Ws, Tb, Vb)

    W_sc = np.asarray(Ws[0]) + 1j * np.asarray(Ws[1])
    np.testing.assert_allclose(W_sc, W_cls, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Tb), np.asarray(ilrma.basis), atol=1e-8)


def test_gauss_ilrma_iss2_step_matches_class():
    """Split-complex ILRMA ISS2 step tracks GaussILRMA(ISS2, MM, power)."""
    import functools

    from ssspy_tpu.bss.ilrma import GaussILRMA
    from ssspy_tpu.ops.splitc import gauss_ilrma_iss2_step_sc

    X, T0, V0 = _ilrma_fixture(seed=6, M=4)

    ilrma = GaussILRMA(n_basis=T0.shape[-1], spatial_algorithm="ISS2", scale_restoration=False)
    Y_cls = np.asarray(ilrma(X.copy(), n_iter=3, basis=T0.copy(), activation=V0.copy()))

    Ys = jnp.asarray(np.stack([X.real, X.imag]))
    Tb, Vb = jnp.asarray(T0), jnp.asarray(V0)
    step = jax.jit(functools.partial(gauss_ilrma_iss2_step_sc, eps=1e-10))
    for _ in range(3):
        Ys, Tb, Vb = step(Ys, Tb, Vb)

    Y_sc = np.asarray(Ys[0]) + 1j * np.asarray(Ys[1])
    np.testing.assert_allclose(Y_sc, Y_cls, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Tb), np.asarray(ilrma.basis), atol=1e-8)
