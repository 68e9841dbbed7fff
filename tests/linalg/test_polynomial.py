import numpy as np
import pytest

from ssspy_tpu.linalg import cbrt, solve_cubic


@pytest.mark.parametrize("batch", [(), (16,)])
def test_solve_cubic_monic(batch):
    rng = np.random.default_rng(0)
    A = rng.standard_normal(batch)
    B = rng.standard_normal(batch)
    C = rng.standard_normal(batch)
    roots = np.asarray(solve_cubic(A, B, C))
    assert roots.shape == (3,) + batch
    residual = roots**3 + A * roots**2 + B * roots + C
    assert np.allclose(residual, 0, atol=1e-7)


def test_solve_cubic_with_leading_coefficient():
    rng = np.random.default_rng(1)
    A = rng.standard_normal(8) + 2.5
    B, C, D = (rng.standard_normal(8) for _ in range(3))
    roots = np.asarray(solve_cubic(A, B, C, D))
    residual = A * roots**3 + B * roots**2 + C * roots + D
    assert np.allclose(residual, 0, atol=1e-7)


def test_solve_cubic_depressed_singular():
    # P = 0 path: x^3 = -C
    roots = np.asarray(solve_cubic(np.zeros(3), np.zeros(3), np.array([8.0, -8.0, 0.0])))
    residual = roots**3 + np.array([8.0, -8.0, 0.0])
    assert np.allclose(residual, 0, atol=1e-10)


def test_cbrt_real_and_complex():
    assert np.allclose(np.asarray(cbrt(np.array([-8.0, 27.0]))), [-2.0, 3.0])
    z = np.array([8j, -27.0 + 0j])
    w = np.asarray(cbrt(z))
    assert np.allclose(w**3, z, atol=1e-12)
