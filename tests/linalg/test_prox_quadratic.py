import numpy as np

from ssspy_tpu.linalg import quadratic
from ssspy_tpu.linalg.prox import l1, l21, neg_log, neg_logdet

from ..helpers import random_hermitian


def test_quadratic():
    rng = np.random.default_rng(0)
    X = rng.standard_normal((5, 3)) + 1j * rng.standard_normal((5, 3))
    A = random_hermitian(rng, (5, 3, 3))
    got = np.asarray(quadratic(X, A))
    want = np.stack([x.conj() @ a @ x for x, a in zip(X, A)])
    assert np.allclose(got, want)


def test_l1_soft_threshold():
    x = np.array([-3.0, -0.5, 0.0, 0.5, 3.0])
    got = np.asarray(l1(x, step_size=1.0))
    want = np.array([-2.0, 0.0, 0.0, 0.0, 2.0])
    assert np.allclose(got, want)


def test_l21_group_shrinkage():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 6)) * 5
    got = np.asarray(l21(x, step_size=1.0))
    norm = np.linalg.norm(x, axis=-1, keepdims=True)
    want = np.maximum(1 - 1.0 / norm, 0) * x
    assert np.allclose(got, want)


def test_neg_log_fixed_point():
    # prox_{-mu log}(x) solves y - x = mu / y
    x = np.array([0.0, 1.0, 5.0])
    y = np.asarray(neg_log(x, step_size=2.0))
    assert np.allclose(y - x, 2.0 / y)


def test_neg_logdet_singular_values():
    rng = np.random.default_rng(2)
    X = rng.standard_normal((3, 4, 4)) + 1j * rng.standard_normal((3, 4, 4))
    Y = np.asarray(neg_logdet(X, step_size=1.5))
    sx = np.linalg.svd(X, compute_uv=False)
    sy = np.linalg.svd(Y, compute_uv=False)
    assert np.allclose(np.sort(sy, axis=-1), np.sort(np.asarray(neg_log(sx, 1.5)), axis=-1), atol=1e-8)
